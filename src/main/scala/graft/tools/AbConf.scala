package graft.tools

import graft.{GraftCache, GraftMetrics, GraftSession, SparkEntry}

/** Dev tool: same-process A/B of one RUNTIME SQL conf over the full
  * query map, with the two settings ALTERNATING by pass so both arms'
  * samples span the same wall-clock windows (this box swings 2-4x
  * between sessions — NOTES r15-r18 — so back-to-back full benches
  * cannot attribute a delta to the setting).
  *
  *   sbt "runMain graft.tools.AbConf <outJson> <confKey> <valA> <valB> [passesPerArm]"
  *
  * Passes run A,B,A,B,... each in Bench's pass-specific deterministic
  * order; the reported number per (query, arm) is the MIN across its
  * passes (min rejects contention spikes harder than the median for
  * equal-cost arms). Timing methodology is Bench's: noop sink, cache
  * cleared between entries.
  */
object AbConf {
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val Array(outJson, key, valA, valB) = args.take(4)
    val passesPerArm = args.lift(4).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftMetrics.install(spark)
    force(SparkEntry.entry(spark)) // warmup
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
    val names = entries.map(_._1)
    val fnByName = entries.toMap
    val times = scala.collection.mutable
      .Map.empty[(String, String), scala.collection.mutable.ArrayBuffer[Double]]
    val failed = scala.collection.mutable.Set.empty[String]
    graft.Bench.orders(names, passesPerArm * 2).zipWithIndex.foreach { case (order, p) =>
      val v = if (p % 2 == 0) valA else valB
      spark.conf.set(key, v)
      System.err.println(s"[ab] pass $p arm=$v")
      order.foreach { name =>
        if (!failed(name)) {
          val t0 = System.nanoTime()
          try {
            force(fnByName(name)(spark, sfDir))
            times.getOrElseUpdate((name, v),
              scala.collection.mutable.ArrayBuffer.empty[Double]) +=
              (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              failed += name
              System.err.println(s"[ab] $name failed: ${e.getMessage}")
          } finally GraftCache.clear()
        }
      }
    }
    def arm(v: String): String = names
      .filterNot(failed)
      .map { n =>
        val xs = times.getOrElse((n, v), Nil)
        "\"" + n + "\":" + (if (xs.isEmpty) "-1" else xs.min)
      }
      .mkString("{", ",", "}")
    val line = s"""{"key":"$key","a":"$valA","b":"$valB","minsA":${arm(valA)},""" +
      s""""minsB":${arm(valB)},"failed":${failed.size},"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line + "\n")
    spark.stop()
    println(line.take(300))
  }
}
