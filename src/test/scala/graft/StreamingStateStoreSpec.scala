package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming operators run, by default, on Spark's
  * HDFS-backed in-memory state store — fine at spec scale, but at
  * 100 TB keyed state must spill to disk, which is what the RocksDB
  * provider exists for. This spec runs every stateful driver query on
  * BOTH providers and pins output equality, so the engine's stateful
  * semantics are provider-independent (the r7 verdict's round-8 item
  * #4). A bogus-provider arm proves the conf pass-through genuinely
  * reaches the state-store machinery — without it, a typo in the
  * provider chain would silently fall back to the default store and
  * the equality tests would vacuously pass.
  */
class StreamingStateStoreSpec extends AnyFunSuite {
  import TestSpark._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The driver queries whose plans carry streaming state: the three
    * GroupState ops (running aggregate, anomaly z-score, curation
    * gate), watermarked dedup, session windows, and the outer
    * stream-stream join (whose null emission is DRIVEN by state
    * eviction — the sharpest provider-equality probe here). */
  private val stateful = Seq(
    "stream_state_running",
    "stream_anomaly_zscore",
    "stream_curation_gate",
    "stream_dedup",
    "stream_sessionize",
    "stream_stream_join_outer",
    "stream_topk_window")

  private def runWith(provider: Option[String], name: String): Seq[String] = {
    val sess = spark.newSession()
    provider.foreach(p => sess.conf.set("spark.graft.stream.stateStoreProvider", p))
    try SparkEntry.queries(name)(sess, sf).collect().toSeq.map(_.toString).sorted
    finally GraftCache.clear()
  }

  for (name <- stateful)
    test(s"$name: identical output on the RocksDB state store") {
      val base = runWith(None, name)
      val rocks = runWith(Some(RocksDb), name)
      assert(base.nonEmpty)
      assert(rocks === base, s"$name diverged across state-store providers")
    }

  test("the provider conf genuinely reaches the state store: a bogus class fails the query") {
    val e = intercept[Throwable] {
      runWith(Some("graft.streaming.NoSuchStateStoreProvider"), "stream_dedup")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    assert(
      chain(e).exists(m => m.contains("NoSuchStateStoreProvider") || m.contains("ClassNotFound")),
      s"expected the bogus provider class in the failure chain, got: ${chain(e).take(3)}")
  }
}
