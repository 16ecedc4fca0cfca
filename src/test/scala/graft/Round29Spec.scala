package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-29 wave: deletion-vector refs record their keys' [min, max]
  * at write time (the r14 deferred format item) — the incremental
  * change feed's carried-file prune answers from the manifest line
  * alone, zero sidecar reads and zero extra jobs; legacy rangeless
  * refs still parse and fall back to the one-small-agg path.
  */
class Round29Spec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap29").toString + "/t"

  private def ordersNarrow = Tables(spark, sf).orders
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  test("mergeMoR and deleteKeys stamp the DV keys' exact range on the ref") {
    val table = tmpTable()
    val base = ordersNarrow.filter(col("o_orderkey") % 3 === 0)
    SnapshotTable.commit(base, table, append = false)
    val batch = base.filter(col("o_orderkey").between(300, 900))
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    SnapshotTable.mergeMoR(batch, table, "o_orderkey")
    val refs = SnapshotTable.dvRefs(
      SnapshotTable.manifest(table, 2L))
    assert(refs.size === 1)
    val want = batch.agg(min("o_orderkey"), max("o_orderkey")).collect()(0)
    assert(refs.head.rangeL === Some((want.getLong(0), want.getLong(1))))
    // deleteKeys too, accumulating a second ranged ref
    SnapshotTable.deleteKeys(
      base.filter(col("o_orderkey").between(1200, 1300)).select("o_orderkey"),
      table, "o_orderkey")
    val refs2 = SnapshotTable.dvRefs(SnapshotTable.manifest(table, 3L))
    assert(refs2.size === 2 && refs2.forall(_.rangeL.isDefined))
  }

  test("the SQL delta path stamps ranges task-side (long and string keys)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap29c").toString
    val cat = "g29" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES('morKey'='k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(100)")
    spark.sql(s"UPDATE $cat.t SET v = 0 WHERE k BETWEEN 10 AND 19")
    val refs = SnapshotTable.dvRefs(SnapshotTable.manifest(s"$wh/t", 3L))
    assert(refs.nonEmpty && refs.forall(_.rangeL.isDefined))
    val (lo, hi) = (refs.map(_.rangeL.get._1).min, refs.map(_.rangeL.get._2).max)
    assert(lo === 10L && hi === 19L)
    // string-keyed morKey
    spark.sql(s"CREATE TABLE $cat.s (name STRING NOT NULL, v BIGINT) " +
      "TBLPROPERTIES('morKey'='name')")
    spark.sql(s"INSERT INTO $cat.s SELECT concat('k-', lpad(id, 3, '0')), id FROM range(50)")
    spark.sql(s"UPDATE $cat.s SET v = 0 WHERE name BETWEEN 'k-010' AND 'k-019'")
    val srefs = SnapshotTable.dvRefs(SnapshotTable.manifest(s"$wh/s", 3L))
    assert(srefs.nonEmpty && srefs.forall(_.rangeS.isDefined))
    val sl = srefs.map(_.rangeS.get._1).min
    val sh = srefs.map(_.rangeS.get._2).max
    assert(sl === "k-010" && sh === "k-019")
  }

  test("ranged refs prune carried files with ZERO extra jobs; stripped legacy " +
      "refs fall back to the sidecar agg — identical results either way") {
    def build(): String = {
      val table = tmpTable()
      val base = ordersNarrow.filter(col("o_orderkey") % 3 === 0)
      SnapshotTable.commit(
        base.repartitionByRange(6, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
        table, append = false, statsColumns = Seq("o_orderkey"))
      val maxk = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0) / 5
      SnapshotTable.mergeMoR(
        base.filter(col("o_orderkey") % 10 === 3 && col("o_orderkey") < maxk)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0),
        table, "o_orderkey")
      table
    }
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(300) } // let queued listener events drain
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val ranged = build()
    val stripped = build()
    // strip the recorded ranges from the stripped table's head manifest
    // (hand-migrated/legacy shape: 3-token refs)
    val mp = s"$stripped/manifests/v2.manifest"
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mp)))
    val strippedTxt = txt.replaceAll(":l:-?\\d+:-?\\d+", "")
    assert(strippedTxt != txt, "fixture must actually strip a recorded range")
    java.nio.file.Files.write(java.nio.file.Paths.get(mp), strippedTxt.getBytes)
    assert(SnapshotTable.dvRefs(SnapshotTable.manifest(stripped, 2L))
      .forall(_.rangeL.isEmpty))

    def feed(t: String) = SnapshotTable
      .changeFeedIncremental(spark, t, 1L, 2L, "o_orderkey")
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var rRanged: Map[String, Long] = null
    var rStripped: Map[String, Long] = null
    val jRanged = countJobs { rRanged = feed(ranged) }
    val jStripped = countJobs { rStripped = feed(stripped) }
    assert(rRanged === rStripped, "range source must never change results")
    assert(rRanged.keySet === Set("update_preimage", "update_postimage"))
    assert(jRanged < jStripped,
      s"recorded ranges must save the sidecar range-agg job ($jRanged vs $jStripped)")
  }

  test("legacy ref forms still parse beside ranged ones") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow.limit(50), table, append = false)
    SnapshotTable.mergeMoR(
      ordersNarrow.limit(50).withColumn("o_totalprice", lit(0.0)),
      table, "o_orderkey")
    val mp = s"$table/manifests/v2.manifest"
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mp)))
    // splice a bare legacy ref (path-only) beside the ranged one
    val fake = s"$table/data/fake_dv.parquet"
    val hex = fake.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val spliced = txt.replaceFirst("dvfiles=", s"dvfiles=$hex;")
    java.nio.file.Files.write(java.nio.file.Paths.get(mp), spliced.getBytes)
    val refs = SnapshotTable.dvRefs(SnapshotTable.manifest(table, 2L))
    assert(refs.size === 2)
    assert(refs.head.path === fake && refs.head.seq === Long.MaxValue &&
      refs.head.count === -1L && refs.head.rangeL.isEmpty)
    assert(refs(1).rangeL.isDefined)
  }
}
