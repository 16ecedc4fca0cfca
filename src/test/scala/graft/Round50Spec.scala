package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCdcSourceProvider, SnapshotSourceProvider, SnapshotTable}

/** Round-50 wave: ATTACH-TIME STREAMING STATE under outstanding
  * deletes. The streaming sources' DV anti-join was UNSCOPED (key-only)
  * — it silently killed (a) the post-images a mergeMoR commit appends
  * beside its own DV on a fresh attach, and (b) rows re-appended after
  * a deleteKeys commit, in both the initial batch and later slices.
  * Now seq-scoped like every batch read path; position sidecars apply
  * at attach too (true per-file ordinals) instead of refusing.
  */
class Round50Spec extends AnyFunSuite {
  import TestSpark._

  private def drainRows(table: String, ckpt: String): Seq[(Long, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream
      .format(SnapshotSourceProvider.format)
      .option("path", table)
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= batch.select("k", "v").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    buf.synchronized(buf.toSeq)
  }

  test("fresh attach after a MoR upsert: the seq-scoped anti-join keeps " +
      "the post-images the unscoped join silently killed") {
    val root = java.nio.file.Files.createTempDirectory("graft50_a").toString
    val table = s"$root/t"
    import spark.implicits._
    SnapshotTable.commit(
      spark.range(10).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("v")),
      table, append = false, statsColumns = Seq("k"))           // v1
    SnapshotTable.deleteKeys(Seq(5L).toDF("k"), table, "k")     // v2
    SnapshotTable.mergeMoR(Seq((2L, 999L)).toDF("k", "v"), table, "k") // v3
    val rows = drainRows(table, s"$root/ck").sorted
    assert(rows === (0L until 10L).filterNot(_ == 5L)
      .map(k => (k, if (k == 2L) 999L else k * 10)),
      "k=2 must carry its POST-image (999), k=5 must stay deleted")
  }

  test("a key re-appended after deleteKeys survives BOTH the initial " +
      "batch and a steady-state slice") {
    val root = java.nio.file.Files.createTempDirectory("graft50_b").toString
    val table = s"$root/t"
    import spark.implicits._
    SnapshotTable.commit(
      spark.range(10).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("v")),
      table, append = false, statsColumns = Seq("k"))           // v1
    SnapshotTable.deleteKeys(Seq(5L).toDF("k"), table, "k")     // v2
    // attach AFTER the delete — the initial batch drops k=5
    val ck = s"$root/ck"
    assert(drainRows(table, ck).sorted ===
      (0L until 10L).filterNot(_ == 5L).map(k => (k, k * 10)))
    // re-append the SAME key (append commits are legal after deletes);
    // the slice must DELIVER it: its file seq exceeds the DV's
    SnapshotTable.commit(
      Seq((5L, 555L)).toDF("k", "v").coalesce(1), table, append = true) // v3
    assert(drainRows(table, ck).sorted === Seq((5L, 555L)),
      "the re-appended row must not be killed by the OLD deletion vector")
    // and a FRESH attach serves the full state with the re-appended row
    assert(drainRows(table, s"$root/ck2").sorted ===
      ((0L until 10L).filterNot(_ == 5L).map(k => (k, k * 10)) :+ (5L, 555L)).sorted)
  }

  test("a position-delete-carrying table attaches: the initial batch " +
      "applies the sidecars by true per-file ordinal (both sources)") {
    val root = java.nio.file.Files.createTempDirectory("graft50_c").toString
    val table = s"$root/t"
    SnapshotTable.commit(
      spark.range(8).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("v")),
      table, append = false, statsColumns = Seq("k"))           // v1
    val prov = spark.read.format(graft.sources.SnapshotV2Provider.format)
      .option("path", table).load()
      .where(col("k") === 3).select("_file", "_pos")
    SnapshotTable.deletePositions(prov, table)                  // v2
    assert(drainRows(table, s"$root/ck").sorted ===
      (0L until 8L).filterNot(_ == 3L).map(k => (k, k * 10)),
      "the append-only source attaches with positions applied")
    // the CDC source's initial load applies them too
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream
      .format(SnapshotCdcSourceProvider.format)
      .option("path", table).option("key", "k")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= batch.select("_change_type", "k").collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", s"$root/ck3")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(buf.synchronized(buf.toSeq).sorted ===
      (0L until 8L).filterNot(_ == 3L).map(k => ("insert", k)),
      "the CDC initial load attaches with positions applied")
  }
}
