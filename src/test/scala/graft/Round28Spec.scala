package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LocalSnapshotIO, SnapshotCatalog, SnapshotTable}

/** Round-28 wave: the CHANGES TABLE (`g.t.changes`) — batch
  * table_changes and streaming CDC addressable through the catalog,
  * served by changeFeedIncremental (src_snapshot_changes_table carries
  * the oracled batch flow).
  */
class Round28Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap28").toString
    val cat = "g28" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def chain(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES('morKey'='k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(20)")      // v2
    spark.sql(s"UPDATE $cat.t SET v = v + 100 WHERE k < 5")            // v3 (MoR)
    spark.sql(s"DELETE FROM $cat.t WHERE k = 7")                       // v4 (MoR)
  }

  test("batch: options-bounded read equals changeFeedIncremental; key defaults to morKey") {
    val (cat, wh) = freshCatalog()
    chain(cat)
    val view = spark.read.option("fromVersion", "2").table(s"$cat.t.changes")
    val api = SnapshotTable.changeFeedIncremental(spark, s"$wh/t", 2L, 4L, "k")
    assert(view.collect().map(_.toString).sorted.toSeq
      === api.collect().map(_.toString).sorted.toSeq)
    val byType = view.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("update_preimage" -> 5L, "update_postimage" -> 5L,
      "delete" -> 1L))
    // toVersion bounds the slice
    assert(spark.read.option("fromVersion", "2").option("toVersion", "3")
      .table(s"$cat.t.changes").filter(col("_change_type") === "delete").count() === 0)
  }

  test("batch refusals: fromVersion required, identity required") {
    val (cat, wh) = freshCatalog()
    chain(cat)
    val e1 = intercept[Exception] {
      spark.read.table(s"$cat.t.changes").count()
    }
    assert(e1.getMessage.contains("fromVersion"))
    // a table with NO declared identity and no key option refuses
    spark.sql(s"CREATE TABLE $cat.u (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.u SELECT id, id FROM range(5)")
    val e2 = intercept[Exception] {
      spark.read.option("fromVersion", "1").table(s"$cat.u.changes").count()
    }
    assert(e2.getMessage.contains("diff identity"))
    // .option("key", ...) supplies it
    assert(spark.read.option("fromVersion", "1").option("key", "k")
      .table(s"$cat.u.changes").count() === 5)
  }

  test("a REAL table named changes wins the name") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.sub.changes (x BIGINT)")
    spark.sql(s"INSERT INTO $cat.sub.changes VALUES (42)")
    val rows = spark.table(s"$cat.sub.changes").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(42L))
  }

  test("streaming: attach-time state as inserts, then per-commit increments; " +
      "staging reclaimed; checkpoint restart redelivers nothing") {
    val (cat, wh) = freshCatalog()
    chain(cat)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ch28ck").toString
    val seen = new java.util.concurrent.atomic.AtomicReference[Seq[(String, Long)]](Nil)
    def drain(): Seq[(String, Long)] = {
      seen.set(Nil)
      val q = spark.readStream.table(s"$cat.t.changes")
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.groupBy("_change_type").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toSeq
          seen.updateAndGet(s => s ++ rows)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get()
    }
    // attach at head v4: 19 live rows as inserts (20 - 1 deleted, updates applied)
    assert(drain().toMap === Map("insert" -> 19L))
    // new commits stream as increments with exact classes
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(100, 103)") // v5
    spark.sql(s"UPDATE $cat.t SET v = 0 WHERE k = 101")                 // v6
    val inc = drain().toMap
    assert(inc === Map("insert" -> 3L, "update_preimage" -> 1L,
      "update_postimage" -> 1L))
    // drained staging is reclaimed by commit(offset) — like the V1
    // source, AT MOST the final in-flight range survives the stop
    // (the engine commits batch N while constructing N+1; Round17Spec
    // pins the same law)
    assert(LocalSnapshotIO.list(s"$wh/t/_cdc_staging").size <= 1)
    // restart with nothing new: zero redelivery
    assert(drain().isEmpty)
  }

  test("streaming: maxVersionsPerTrigger bounds each micro-batch") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES('morKey'='k')")
    for (i <- 0 to 3)
      spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(${i * 10}, ${i * 10 + 10})")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .option("fromVersion", "2")              // start mid-chain: incremental only
      .option("maxVersionsPerTrigger", "1")
      .table(s"$cat.t.changes")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { batches.incrementAndGet(); rows.addAndGet(n) }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ch28ck2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // commits v3..v5 drain one version per batch, 10 inserts each
    assert(batches.get() === 3 && rows.get() === 30L)
  }
}
