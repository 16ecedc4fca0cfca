package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-23 wave: MERGE-ON-READ UPDATE / MERGE — sequence-scoped
  * deletion vectors (Iceberg-v2 equality deletes), the API `mergeMoR`,
  * and the SQL delta path (SupportsDelta via TBLPROPERTIES morKey).
  *
  * Pins the verdict's done-list: zero data files rewritten on a
  * selective UPDATE, post-images visible at head, pre-images via
  * VERSION AS OF, changeFeed emitting update pre/post-images across
  * the MoR commit, compaction materializing and dropping DV state,
  * and CoW-vs-MoR result identity — plus the sequence-scoping rules
  * themselves (a post-image survives the DV shipped beside it; a row
  * re-appended after deleteKeys is NOT swallowed by the older DV).
  */
class Round23Spec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap23").toString + "/t"

  private def ordersNarrow = Tables(spark, sf).orders
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  private def keys(df: DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  private def rowSet(df: DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  /** v1 = 4 range-clustered files with o_orderkey stats. */
  private def seeded(table: String): Unit =
    SnapshotTable.commit(
      ordersNarrow.repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      table, append = false, statsColumns = Seq("o_orderkey"))

  /** updates: %10==7 re-priced to -1.0; deletes: %10==3. */
  private def cdcBatch: DataFrame =
    ordersNarrow.filter(col("o_orderkey") % 10 === 7)
      .withColumn("o_totalprice", lit(-1.0)).withColumn("_del", lit(false))
      .unionByName(
        ordersNarrow.filter(col("o_orderkey") % 10 === 3).withColumn("_del", lit(true)))

  // ---- API mergeMoR -----------------------------------------------------

  test("mergeMoR: zero data files rewritten; head post-images; v1 pre-images") {
    val table = tmpTable()
    seeded(table)
    val before = SnapshotTable.manifest(table, 1L).files.map(_.path).toSet
    val (delKeys, appended, v) =
      SnapshotTable.mergeMoR(cdcBatch, table, "o_orderkey", deleteCol = Some("_del"))
    assert(v === 2L && appended >= 1)
    assert(delKeys === keys(ordersNarrow.filter(
      col("o_orderkey") % 10 === 7 || col("o_orderkey") % 10 === 3)).size)
    val after = SnapshotTable.manifest(table, 2L).files.map(_.path).toSet
    assert(before.subsetOf(after), "MoR must rewrite ZERO existing data files")
    assert((after -- before).size === appended)
    // head: deletes gone, updates re-priced (the post-image SURVIVES the
    // DV that ships beside it — the sequence-scoping core), rest intact
    val head = SnapshotTable.read(spark, table)
    assert(keys(head.filter(col("o_orderkey") % 10 === 3)) === Set.empty)
    val upd = head.filter(col("o_orderkey") % 10 === 7)
    assert(upd.count() > 0 &&
      upd.agg(max(abs(col("o_totalprice") + 1.0))).collect()(0).getDouble(0) === 0.0)
    assert(rowSet(head.filter(col("o_orderkey") % 10 === 1)) ===
      rowSet(ordersNarrow.filter(col("o_orderkey") % 10 === 1)))
    // pre-images via time travel
    assert(rowSet(SnapshotTable.read(spark, table, Some(1L))) === rowSet(ordersNarrow))
  }

  test("mergeMoR: changeFeed emits update pre/post-images and deletes across the commit") {
    val table = tmpTable()
    seeded(table)
    SnapshotTable.mergeMoR(cdcBatch, table, "o_orderkey", deleteCol = Some("_del"))
    val cf = SnapshotTable.changeFeed(spark, table, 1L, 2L, "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    val byType = cf.groupBy(_._1).view.mapValues(_.length).toMap
    val nUpd = ordersNarrow.filter(col("o_orderkey") % 10 === 7).count().toInt
    val nDel = ordersNarrow.filter(col("o_orderkey") % 10 === 3).count().toInt
    assert(byType.getOrElse("update_preimage", 0) === nUpd)
    assert(byType.getOrElse("update_postimage", 0) === nUpd)
    assert(byType.getOrElse("delete", 0) === nDel)
    assert(byType.getOrElse("insert", 0) === 0)
    assert(cf.filter(_._1 == "update_postimage").forall(_._3 === -1.0))
    assert(cf.filter(_._1 == "update_preimage").forall(_._3 !== -1.0))
  }

  test("mergeMoR: second batch stacks; compaction materializes; CoW identity") {
    val table = tmpTable()
    val cow = tmpTable()
    seeded(table); seeded(cow)
    SnapshotTable.mergeMoR(cdcBatch, table, "o_orderkey", deleteCol = Some("_del"))
    SnapshotTable.merge(cdcBatch, table = cow, key = "o_orderkey",
      deleteCol = Some("_del"), statsColumns = Seq("o_orderkey"))
    // second MoR batch re-updates a key the first already updated:
    // the NEWER post-image must win (its DV seq outranks the older file)
    val batch2 = ordersNarrow.filter(col("o_orderkey") % 20 === 7)
      .withColumn("o_totalprice", lit(-2.0)).withColumn("_del", lit(false))
    SnapshotTable.mergeMoR(batch2, table, "o_orderkey", deleteCol = Some("_del"))
    SnapshotTable.merge(batch2, table = cow, key = "o_orderkey",
      deleteCol = Some("_del"), statsColumns = Seq("o_orderkey"))
    assert(rowSet(SnapshotTable.read(spark, table)) ===
      rowSet(SnapshotTable.read(spark, cow)),
      "merge-on-read and copy-on-write must agree row for row")
    val expected = rowSet(SnapshotTable.read(spark, table))
    SnapshotTable.compactSnapshot(spark, table, targetBytes = 64L << 10,
      clusterBy = Seq("o_orderkey"))
    val head = SnapshotTable.manifest(table, SnapshotTable.currentVersion(table))
    assert(head.extra.get("dvfiles").forall(_.isEmpty),
      "compaction must drop the DV state")
    assert(rowSet(SnapshotTable.read(spark, table)) === expected)
  }

  test("sequence scoping: a key re-appended after deleteKeys is visible again") {
    val table = tmpTable()
    val o = ordersNarrow
    SnapshotTable.commit(o, table, append = false)
    val k = o.select(min("o_orderkey")).collect()(0).getLong(0)
    SnapshotTable.deleteKeys(o.filter(col("o_orderkey") === k).select("o_orderkey"),
      table, "o_orderkey")
    assert(!keys(SnapshotTable.read(spark, table)).contains(k))
    // upsert semantics: the re-append (seq 3) postdates the DV (seq 2)
    SnapshotTable.commit(
      o.filter(col("o_orderkey") === k).withColumn("o_totalprice", lit(-9.0)),
      table, append = true)
    val back = SnapshotTable.read(spark, table).filter(col("o_orderkey") === k)
    assert(back.count() === 1 && back.collect()(0).getDouble(2) === -9.0,
      "a row appended AFTER the delete must not be swallowed by the older DV")
  }

  test("mergeMoR refusals: clustered table, mismatched DV chain key") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow, table, append = false,
      clusterBy = Some("o_orderpriority"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.mergeMoR(ordersNarrow.limit(1), table, "o_orderkey")
    }
    assert(e.getMessage.contains("one-key-per-file"))
    val t2 = tmpTable()
    SnapshotTable.commit(ordersNarrow, t2, append = false)
    SnapshotTable.deleteKeys(
      ordersNarrow.limit(1).select(col("o_orderpriority")), t2, "o_orderpriority")
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.mergeMoR(ordersNarrow.limit(1), t2, "o_orderkey")
    }
    assert(e2.getMessage.contains("one delete key per DV chain"))
  }

  // ---- SQL delta path (SupportsDelta) ------------------------------------

  private def newCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_mor23").toString
    val cat = "gm" + System.nanoTime().toString.takeRight(9)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def seededSql(cat: String, morKey: Boolean): Long = {
    val props =
      if (morKey) "TBLPROPERTIES('statsColumns'='k','morKey'='k')"
      else "TBLPROPERTIES('statsColumns'='k')"
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, p DOUBLE) $props")
    Tables(spark, sf).orders
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      .createOrReplaceTempView(s"graft_mor23_src_$cat")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM graft_mor23_src_$cat")
    spark.table(s"$cat.t").count()
  }

  private def dataPaths(wh: String): Set[String] =
    SnapshotTable.manifest(s"$wh/t", SnapshotTable.currentVersion(s"$wh/t"))
      .files.map(_.path).toSet

  test("SQL UPDATE on a morKey table: delta plan, zero data files rewritten") {
    val (cat, wh) = newCat()
    val n = seededSql(cat, morKey = true)
    val before = dataPaths(wh)
    spark.sql(s"UPDATE $cat.t SET p = -1.0 WHERE k % 10 = 7")
    val m = SnapshotTable.manifest(s"$wh/t", 3L)
    assert(before.subsetOf(dataPaths(wh)),
      "delta UPDATE must rewrite ZERO existing data files")
    assert(m.extra.get("dvfiles").exists(_.nonEmpty),
      "the update lands as a DV sidecar")
    // post-images at head, row count conserved, pre-images time-travel
    val head = spark.table(s"$cat.t")
    assert(head.count() === n)
    assert(head.filter(col("k") % 10 === 7 && col("p") =!= -1.0).count() === 0)
    assert(head.filter(col("k") % 10 === 7).count() ===
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2 WHERE k % 10 = 7 AND p <> -1.0")
        .count())
    // pruned projection WITHOUT the key still DV-filters (force-read)
    assert(head.agg(sum(when(col("p") === -1.0, 1L).otherwise(0L)))
      .collect()(0).getLong(0) === head.filter(col("k") % 10 === 7).count())
  }

  test("SQL MERGE INTO MoR: matched update + not-matched insert in one delta commit") {
    val (cat, wh) = newCat()
    seededSql(cat, morKey = true)
    val maxK = spark.table(s"$cat.t").agg(max("k")).collect()(0).getLong(0)
    spark.sql(
      s"""MERGE INTO $cat.t USING (
         |  SELECT k, -3.0 AS p FROM $cat.t VERSION AS OF 2 WHERE k % 10 = 1
         |  UNION ALL SELECT ${maxK + 5} AS k, 99.0 AS p
         |) s ON $cat.t.k = s.k
         |WHEN MATCHED THEN UPDATE SET p = s.p
         |WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.p)""".stripMargin)
    val head = spark.table(s"$cat.t")
    assert(head.filter(col("k") % 10 === 1 && col("k") <= maxK && col("p") =!= -3.0)
      .count() === 0)
    assert(head.filter(col("k") === maxK + 5).collect().map(_.getDouble(1)).toSeq
      === Seq(99.0))
    assert(SnapshotTable.manifest(s"$wh/t", 3L)
      .extra.get("dvfiles").exists(_.nonEmpty))
  }

  test("SQL DELETE unprovable predicate routes delta: DV, no rewrite, count right") {
    val (cat, wh) = newCat()
    val n = seededSql(cat, morKey = true)
    val before = dataPaths(wh)
    val dead = spark.table(s"$cat.t").filter(col("k") % 7 === 3).count()
    spark.sql(s"DELETE FROM $cat.t WHERE k % 7 = 3")
    assert(dataPaths(wh) === before, "row-level delta DELETE adds no data files")
    assert(spark.table(s"$cat.t").count() === n - dead)
    // a second row-level op stacks on the same DV chain
    spark.sql(s"UPDATE $cat.t SET p = -4.0 WHERE k % 7 = 5")
    assert(spark.table(s"$cat.t").filter(col("k") % 7 === 3).count() === 0)
    assert(spark.table(s"$cat.t")
      .filter(col("k") % 7 === 5 && col("p") =!= -4.0).count() === 0)
  }

  test("SQL CoW-vs-MoR identity; CALL compact materializes the DV chain") {
    val (mor, morWh) = newCat()
    val (cow, _) = newCat()
    seededSql(mor, morKey = true)
    seededSql(cow, morKey = false)
    for (c <- Seq(mor, cow)) {
      spark.sql(s"UPDATE $c.t SET p = -1.0 WHERE k % 10 = 7")
      spark.sql(s"DELETE FROM $c.t WHERE k % 10 = 3 AND p > 0")
    }
    def all(c: String) = spark.table(s"$c.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(all(mor) === all(cow), "delta and copy-on-write must agree row for row")
    val expected = all(mor)
    spark.sql(s"CALL $mor.system.compact('t', ${128L << 20})")
    val head = SnapshotTable.manifest(s"$morWh/t",
      SnapshotTable.currentVersion(s"$morWh/t"))
    assert(head.extra.get("dvfiles").forall(_.isEmpty),
      "compaction must drop DV state")
    assert(all(mor) === expected)
  }

  test("v2 pushdowns decline under outstanding DVs; CREATE refuses nullable morKey") {
    val (cat, _) = newCat()
    val n = seededSql(cat, morKey = true)
    spark.sql(s"UPDATE $cat.t SET p = -1.0 WHERE k % 10 = 7")
    // COUNT(*) must NOT serve from the manifest (it would overcount):
    // with the aggregate push declined, the count reflects the DVs
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.t").collect()(0).getLong(0) === n)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (k BIGINT, p DOUBLE) TBLPROPERTIES('morKey'='k')")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("NOT NULL"))))
  }
}
