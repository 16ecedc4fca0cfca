package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The snapshot table as a Structured Streaming SOURCE — the
  * completion of the landing-table loop `stream_snapshot_sink` opened:
  * producers commit micro-batches through [[SnapshotTable.appendBatch]]
  * (exactly-once by manifest batch id), and consumers now FOLLOW the
  * manifest chain continuously instead of polling `readIncremental` by
  * hand. This is the Delta change-feed shape: the streaming offset IS
  * the snapshot version, so Spark's own offset log (write-ahead,
  * checkpointed) carries commit-chain positions, and a restart replays
  * exactly the (start, end] version slice the WAL recorded — replay
  * idempotence comes from manifest immutability: the same version
  * range always resolves to the same immutable data files.
  *
  * Batch resolution:
  *   - initial load (no start offset): the FULL snapshot at the end
  *     version — the table's history before the stream attached is one
  *     base batch (Delta's initial-snapshot semantics);
  *   - steady state: `readIncremental(start, end)` — the manifest
  *     difference, metadata-only planning. An overwrite or merge commit
  *     inside the range fails loudly rather than emitting a wrong
  *     delta, exactly like the batch change-scan.
  *
  * Registered through the V1 StreamSourceProvider API (the same public
  * hook FileStreamSource ships on), which hands back a DataFrame per
  * micro-batch — so the files of a slice are read by Spark's normal
  * distributed parquet scan, with the manifest schema pinned.
  *
  * Scale posture: getOffset is one metadata listing; getBatch plans
  * from two manifests (file-count-sized); data movement is the
  * executors' parquet scan of exactly the new files. A 100 TB landing
  * table streams at the cost of its deltas.
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = SnapshotSourceProvider.tableOf(parameters)
    val v = SnapshotTable.currentVersion(table)
    require(v > 0 || schema.isDefined,
      s"snapshot table $table has no published version yet — pass an explicit schema")
    (shortName(), schema.getOrElse(SnapshotTable.manifest(table, v).schema))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(
      sqlContext,
      SnapshotSourceProvider.tableOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}

object SnapshotSourceProvider {
  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot source needs .option(\"path\", <table root>)"))

  /** `spark.readStream.format(...)` needs the provider CLASS name. */
  val format: String = classOf[SnapshotSourceProvider].getName
}

private[sources] class SnapshotSource(
    sqlContext: SQLContext,
    table: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None) extends Source {

  // admission-control cursor: the last offset a batch was planned up
  // to, advanced in getBatch (which also replays the WAL position on
  // restart — so the cap composes with recovery correctly)
  @volatile private var planned = 0L

  /** Latest published version = the stream's high-water offset; None
    * until the first commit publishes. One metadata listing. With
    * `maxVersionsPerTrigger` set, the offset advances at most that
    * many versions past the last planned batch — Delta's
    * maxFilesPerTrigger shape: a long backlog (or the initial history)
    * drains as bounded micro-batches instead of one giant one. */
  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.currentVersion(table)
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(v, planned + n)
      case None    => v
    }
    if (capped == 0L) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = version(end)
    planned = math.max(planned, to)
    val files = start.map(version).filter(_ > 0L) match {
      case None =>
        // initial load: everything the table held up to `to` is the
        // base batch — resolved from to's manifest alone
        SnapshotTable.manifest(table, to).files.map(_.path)
      case Some(from) if from >= to => Nil
      case Some(from)               => SnapshotTable.incrementalFiles(table, from, to)
    }
    // the plan must carry streaming leaves (MicroBatchExecution asserts
    // it) while staying a declarative parquet relation — the Bridge
    // shim builds exactly what FileStreamSource hands back
    org.apache.spark.sql.graftbridge.Bridge
      .streamingParquetBatch(sqlContext.sparkSession, files, schema)
  }

  /** Offsets come back as SerializedOffset after a checkpoint restart;
    * LongOffset's json is the bare number. */
  private def version(o: Offset): Long = o match {
    case LongOffset(v)       => v
    case SerializedOffset(j) => j.trim.toLong
    case other               => other.json().trim.toLong
  }

  override def stop(): Unit = ()
}
