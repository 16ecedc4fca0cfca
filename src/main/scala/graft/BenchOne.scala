package graft

/** Dev tool: time individual catalog queries (2 reps, noop sink).
  *   sbt "runMain graft.BenchOne q1,q2,... [sfDir]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(0).split(",")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
