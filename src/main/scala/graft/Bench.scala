package graft

import org.apache.spark.sql.DataFrame

/** Driver benchmark contract: one JSON line with per-query wall times at
  * SPARK_GRAFT_SF_DIR. Results are materialized through the noop v2 sink
  * — a bare count() would let Catalyst prune projections and
  * under-measure; noop forces every output column through the plan.
  *
  * Each query runs against a cleared cache (GraftCache.clear between
  * entries): earlier rounds let a query silently reuse a predecessor's
  * persisted plan through the cache manager, which flattered whichever
  * query ran second. Timings here are per-query self-contained costs;
  * queries that legitimately reuse an intermediate persist it
  * themselves inside their own plan.
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftMetrics.install(spark)

    // JIT/classloading warmup on the tiny sf so per-query numbers
    // reflect the engine, not first-touch costs.
    force(SparkEntry.entry(spark))

    // optional local-iteration filter (driver sets neither)
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // dt captured BEFORE the cache teardown in finally — the unpersist
      // bookkeeping is harness cost, not query cost
      var dt = -1.0
      try {
        force(fn(spark, sfDir))
        dt = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
      } finally GraftCache.clear() // timings never borrow a predecessor's cache
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout capture can truncate the per-query tail; the same line goes
    // to a file (cwd-relative — the harness runs from the repo root, and
    // SPARK_GRAFT_BENCH_OUT overrides) so the full map survives.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: $e") }
    spark.stop()
  }
}
