package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 hardening: the bucketed-table stage under concurrent
  * sessions (VERDICT r6 next-round #7). The contract: each writer
  * stages into a private scratch dir and publishes with ONE atomic
  * rename, so racing sessions are safe — exactly one writer wins,
  * losers clean up, readers only ever observe the published dir
  * complete with _SUCCESS or absent.
  */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  test("rel_join_bucketed staging survives two sessions racing the same corpus") {
    val liFile = new java.io.File(sf, "lineitem.parquet")
    val ordFile = new java.io.File(sf, "orders.parquet")
    val base = Stage.dir(
      "graft_bkt_",
      sf,
      liFile.length(),
      liFile.lastModified(),
      ordFile.length(),
      ordFile.lastModified())
    val corpusTag = base.getName.stripPrefix("graft_bkt_").take(12)

    // force BOTH racers onto the writer path: wipe the published stage
    // and the catalog pointers
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(base)
    for (t <- Seq(s"g_bkt_lineitem_$corpusTag", s"g_bkt_orders_$corpusTag"))
      spark.sql(s"DROP TABLE IF EXISTS $t")

    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new Array[Either[Throwable, Seq[(Long, String, Long)]]](2)
    val threads = (0 until 2).map { i =>
      val session = spark.newSession()
      new Thread(() => {
        gate.await()
        results(i) =
          try Right(
            SparkEntry
              .queries("rel_join_bucketed")(session, sf)
              .collect()
              .toSeq
              .map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
          catch { case e: Throwable => Left(e) }
      })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(300000))

    // both sessions complete with identical, non-empty answers
    results.foreach {
      case Left(e) => fail(s"racing session failed: $e", e)
      case Right(rows) => assert(rows.nonEmpty)
    }
    assert(results(0).toOption.get === results(1).toOption.get)

    // the published stage is _SUCCESS-complete and no loser scratch
    // dir leaked
    for (t <- Seq(s"g_bkt_lineitem_$corpusTag", s"g_bkt_orders_$corpusTag")) {
      assert(new java.io.File(new java.io.File(base, t), "_SUCCESS").exists(), t)
    }
    val leftovers = Option(base.listFiles()).toSeq.flatten.map(_.getName).filter(_.contains("_stage_"))
    assert(leftovers.isEmpty, s"scratch dirs leaked: $leftovers")
    GraftCache.clear()
  }

  test("rel_sketch_kmv_setops estimates land near exact and plan is heap-bounded") {
    val df = SparkEntry.queries("rel_sketch_kmv_setops")(spark, sf)
    val r = df.collect().head
    val (k, estA, estB, estU) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (nInterSk, estI, exactU, exactI) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(k === 64L)
    assert(nInterSk <= k, "sketch intersection cannot exceed k")
    // k=64 -> ~12.6% stderr; 40%/50% gates are ~3-4 sigma, so a failure
    // means a broken estimator, not an unlucky hash draw
    def within(est: Long, exact: Long, tol: Double): Boolean =
      math.abs(est - exact) <= exact * tol
    assert(within(estU, exactU, 0.4), s"union estimate $estU vs exact $exactU")
    assert(within(estI, exactI, 0.5), s"intersection estimate $estI vs exact $exactI")
    // segments overlap, so the union estimate must not exceed the sum
    assert(estU <= estA + estB, s"union $estU > $estA + $estB")
    // the k-smallest selection is the bounded heap, never a window sort
    assert(PlanCheck.has[graft.plans.TopKPerGroupExec](df), PlanCheck.render(df))
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.window.WindowExec](df),
      PlanCheck.render(df))
    GraftCache.clear()
  }
}
