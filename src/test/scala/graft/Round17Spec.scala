package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LocalSnapshotIO, SnapshotTable}

/** Round-17 wave: the streaming staging LIFECYCLE (the one round-12
  * `weak` item — `_cdc_staging` grew one directory per micro-batch for
  * a stream's whole lifetime) plus the round-12 ADVICE fixes: the
  * rate-source record-law overflow (pinned in Round16Spec), dropBranch
  * leaking branch-local segment files, vacuum on a branch path, and
  * jpegDecode accepting a DQT-less stream as a uniform gray image.
  */
class Round17Spec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap17").toString + "/t"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_meta17").toString

  private def keys(df: DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  private def ordersNarrow = Tables(spark, sf).orders
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  private def stagingRanges(table: String): Seq[String] =
    LocalSnapshotIO.list(s"$table/_cdc_staging").sorted

  // ---- purgeStaging: the reclamation primitive ----------------------

  test("purgeStaging reclaims ranges at/below upTo, leaves live ranges and foreign names") {
    val root = tmpDir() + "/_cdc_staging"
    for (r <- Seq("0_1", "1_2", "2_3"); f <- Seq("part-0.parquet", "_SUCCESS"))
      LocalSnapshotIO.writeString(s"$root/$r/$f", "x")
    LocalSnapshotIO.writeString(s"$root/not_a_range_dir/f", "x")
    assert(SnapshotTable.purgeStaging(root, upTo = 2L) === 2)
    assert(LocalSnapshotIO.list(root).sorted === Seq("2_3", "not_a_range_dir"),
      "ranges above upTo (in-flight/replayable) and non-range names must survive")
    // idempotent: nothing left at/below 2
    assert(SnapshotTable.purgeStaging(root, upTo = 2L) === 0)
    assert(SnapshotTable.purgeStaging(root, upTo = 3L) === 1)
    assert(LocalSnapshotIO.list(root) === Seq("not_a_range_dir"))
  }

  // ---- CDC source: post-commit purge, source-level contract ---------

  test("cdc source: commit(offset) reclaims drained staging, keeps ranges above it") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val table = tmpTable()
    val o = ordersNarrow.filter(col("o_orderkey") % 7 === 0)
    for (m <- 0 to 2)
      SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === m.toLong), table,
        append = m > 0, statsColumns = Seq("o_orderkey"))
    val src = new graft.sources.SnapshotCdcSourceProvider().createSource(
      spark.sqlContext, tmpDir(), None, "",
      Map("path" -> table, "key" -> "o_orderkey", "maxVersionsPerTrigger" -> "1"))
    // initial load (no start) serves off manifests — no staging
    src.getBatch(None, LongOffset(1L))
    assert(stagingRanges(table).isEmpty, "initial load must not materialize staging")
    // two steady-state slices materialize their range dirs
    src.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    src.getBatch(Some(LongOffset(2L)), LongOffset(3L))
    assert(stagingRanges(table) === Seq("1_2", "2_3"))
    // Spark durably committed through 2: (1,2] is dead weight, (2,3]
    // is still in flight and must survive
    src.commit(LongOffset(2L))
    assert(stagingRanges(table) === Seq("2_3"),
      "post-commit purge must reclaim exactly the drained ranges")
    src.commit(LongOffset(3L))
    assert(!LocalSnapshotIO.exists(s"$table/_cdc_staging"),
      "a fully drained stream leaves zero staging behind")
    // a replay ABOVE any committed offset still works: getBatch
    // re-materializes from the immutable manifests before reading
    val replay = src.getBatch(Some(LongOffset(2L)), LongOffset(3L))
    assert(replay.isStreaming)
    assert(stagingRanges(table) === Seq("2_3"), "replay re-materialized its slice")
  }

  test("cdc source: a REAL multi-batch drain leaves at most the final in-flight range") {
    val table = tmpTable()
    val out = tmpDir() + "/out"
    val ckpt = tmpDir()
    val o = ordersNarrow.filter(col("o_orderkey") % 5 === 0)
    for (m <- 0 to 2)
      SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === m.toLong), table,
        append = m > 0, statsColumns = Seq("o_orderkey"))
    val q = spark.readStream
      .format(graft.sources.SnapshotCdcSourceProvider.format)
      .option("path", table)
      .option("key", "o_orderkey")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => batch.count(); () }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the engine commits each batch as it completes; whether the FINAL
    // batch's source-commit fires before stop is an engine detail —
    // the lifetime-leak contract is that the backlog's history does
    // NOT accumulate (3 version slices => at most 1 surviving range)
    assert(stagingRanges(table).size <= 1,
      s"staging accumulated a stream's history: ${stagingRanges(table)}")
  }

  // ---- vacuum: offline staging sweep below the retention floor ------

  test("vacuum sweeps cdc staging below retention, keeps ranges at head") {
    val table = tmpTable()
    val o = ordersNarrow
    for (m <- 0 to 2)
      SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === m.toLong), table, append = m > 0)
    for (r <- Seq("0_1", "1_2", "2_3"))
      LocalSnapshotIO.writeString(s"$table/_cdc_staging/$r/part-0.parquet", "x")
    SnapshotTable.vacuum(table, retainLast = 1) // keep = {3}; staging upTo = 2
    assert(stagingRanges(table) === Seq("2_3"),
      "vacuum must sweep exactly the ranges below the retention floor")
  }

  // ---- dropBranch: branch-local segment files reclaimed -------------

  test("dropBranch reclaims an audit-failed branch's segment files; published segments survive") {
    val table = tmpTable()
    val o = ordersNarrow
    SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)

    // audit-FAILED branch: its commits' segments must be reclaimed
    SnapshotTable.createBranch(table, "bad")
    val bp = SnapshotTable.branchPath(table, "bad")
    SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 1), bp, append = true)
    val badSegDir = s"$bp/manifests/segments"
    assert(LocalSnapshotIO.list(badSegDir).nonEmpty, "fixture: branch wrote segments")
    SnapshotTable.dropBranch(table, "bad")
    assert(LocalSnapshotIO.list(badSegDir).isEmpty,
      "dropBranch leaked the audit-failed branch's segment files")

    // PUBLISHED branch: main's fast-forward manifest references the
    // branch's segments in place — dropBranch must leave them
    SnapshotTable.createBranch(table, "good")
    val gp = SnapshotTable.branchPath(table, "good")
    SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 2), gp, append = true)
    SnapshotTable.publishBranch(table, "good")
    val headKeys = keys(SnapshotTable.read(spark, table))
    SnapshotTable.dropBranch(table, "good")
    assert(keys(SnapshotTable.read(spark, table)) === headKeys,
      "dropBranch reclaimed segments main's published manifest still references")
  }

  // ---- vacuum: refused on a branch path ------------------------------

  test("vacuum refuses a */branches/* path (branch-local vacuum cannot see main's refs)") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow.limit(10), table, append = false)
    SnapshotTable.createBranch(table, "audit")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.vacuum(SnapshotTable.branchPath(table, "audit"), retainLast = 1)
    }
    assert(e.getMessage.contains("branch"))
  }

  // ---- jpeg: a DQT-less stream must refuse, not decode gray ----------

  test("jpegDecode refuses a stream whose DQT segment is missing") {
    import graft.multimodal.RealCodecs
    val good = RealCodecs.jpegBytes(7L, "The quick brown fox jumps over the lazy dog")
    // splice the DQT (FFDB) segment out of the marker stream
    def stripDqt(a: Array[Byte]): Array[Byte] = {
      var pos = 2
      while (pos + 4 <= a.length) {
        val m = a(pos + 1) & 0xff
        val len = ((a(pos + 2) & 0xff) << 8) | (a(pos + 3) & 0xff)
        if (m == 0xdb) return a.take(pos) ++ a.drop(pos + 2 + len)
        if (m == 0xda) fail("fixture reached SOS without finding DQT")
        pos += 2 + len
      }
      fail("fixture: no DQT segment found")
    }
    val e = intercept[IllegalArgumentException] {
      RealCodecs.jpegStats(graft.multimodal.StubDecoder.Blob(7L, stripDqt(good)))
    }
    assert(e.getMessage.contains("DQT"),
      s"expected the missing-DQT refusal, got: ${e.getMessage}")
    // and the untouched stream still decodes
    assert(RealCodecs.jpegStats(graft.multimodal.StubDecoder.Blob(7L, good)).n_px > 0)
  }
}
