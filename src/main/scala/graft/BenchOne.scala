package graft

/** Dev tool: time individual catalog queries (noop sink).
  *   sbt "runMain graft.BenchOne q1,q2,... [sfDir] [reps=N] [clear]"
  * `clear` evicts GraftCache between reps — the driver-Bench-like mode
  * (without it, rep2+ rides any persist the query registers).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(0).split(",")
    val dir = args.drop(1).find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(2)
    val clear = args.contains("clear")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (n <- names; rep <- 1 to reps) {
      if (clear) GraftCache.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
