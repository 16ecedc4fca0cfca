package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The CHANGES TABLE — the incremental change feed addressable through
  * the catalog (Iceberg's `cat.t.changes` / Delta's `table_changes`
  * shape, served by [[SnapshotTable.changeFeedIncremental]]):
  *
  * {{{
  *   -- batch: the row-level changes of commits (from, to]
  *   spark.read.option("fromVersion", 2).option("toVersion", 4)
  *     .table("g.t.changes")
  *   -- streaming: follow the commit chain continuously
  *   spark.readStream.option("key", "k").table("g.t.changes")
  * }}}
  *
  * Schema = `_change_type`, the data columns, `_commit_version`. The
  * diff key defaults to the table's declared row identity (morKey,
  * else the DV chain's key) and can be overridden with
  * `.option("key", col)`; when a commit in range stamps deletion
  * vectors the key MUST be that identity (changeFeedIncremental's
  * refusal). Batch requires `fromVersion` (>= 1); `toVersion` defaults
  * to head. The streaming arm's offsets are snapshot versions (the
  * checkpointed WAL carries commit-chain positions, restarts replay the
  * same immutable slice); the initial batch is the attach-time STATE as
  * `insert` rows — deletion vectors applied — and every later batch is
  * the per-commit incremental diff at O(touched files).
  *
  * Each planned slice is MATERIALIZED deterministically under
  * `_cdc_staging/` (a WAL replay overwrites identical content from the
  * same immutable manifests) and served as an ordinary distributed
  * parquet scan; `commit(offset)` reclaims drained staging exactly like
  * the V1 CDC source (vacuum sweeps undrained leftovers). A REAL table
  * or metadata view named `changes` wins the name — this view only
  * resolves when nothing else does.
  */
private[sources] class SnapshotChangesTable(tablePath: String)
    extends Table with SupportsRead {

  private val head = SnapshotTable.currentVersion(tablePath)
  require(head > 0, s"snapshot table $tablePath has no published version")
  private val m = SnapshotTable.manifest(tablePath, head)

  override def name(): String = s"$tablePath.changes"

  override def schema(): StructType = SnapshotChanges.cdcSchema(m.schema)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val key = Option(options.get("key"))
      .orElse(SnapshotTable.morKeyOf(m))
      .orElse(m.extra.get("dvkey"))
      .getOrElse(throw new IllegalArgumentException(
        s"the changes view of $tablePath needs a diff identity — declare " +
          "TBLPROPERTIES('morKey'=...) or pass .option(\"key\", <column>)"))
    require(m.schema.fieldNames.contains(key), s"no column $key in $tablePath")
    val from = Option(options.get("fromVersion")).map(_.toLong)
    val to = Option(options.get("toVersion")).map(_.toLong)
    val maxV = Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
    () => new SnapshotChangesScan(tablePath, schema(), key, from, to, maxV)
  }
}

private[sources] object SnapshotChanges {
  /** `_change_type`, data columns, `_commit_version`. */
  def cdcSchema(table: StructType): StructType =
    StructType(
      StructField("_change_type", StringType, nullable = true) +:
        table.fields.toSeq :+
        StructField("_commit_version", LongType, nullable = true))

  /** Materialize a deterministic change slice into `staging` and list
    * its files. The path is keyed by the range, so a replay overwrites
    * identical content (immutable manifests) before reading. */
  private[sources] def materialize(
      table: String, key: String, from: Long, to: Long, staging: String): Seq[String] = {
    val spark = SparkSession.active
    val df =
      if (from == 0L) {
        // attach-time STATE as insert rows (deletion vectors applied by
        // the read path), stamped with the state's version
        import org.apache.spark.sql.functions.{col, lit}
        val m = SnapshotTable.manifest(table, to)
        SnapshotTable.read(spark, table, Some(to)).select(
          lit("insert").as("_change_type") +:
            m.schema.fieldNames.toSeq.map(col) :+
            lit(to).as("_commit_version"): _*)
      } else SnapshotTable.changeFeedIncremental(spark, table, from, to, key)
    df.write.mode("overwrite").parquet(staging)
    LocalSnapshotIO.list(staging).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$staging/$n")
  }
}

private[sources] class SnapshotChangesScan(
    table: String,
    cdcSchema: StructType,
    key: String,
    fromOpt: Option[Long],
    toOpt: Option[Long],
    maxVersionsPerTrigger: Option[Long]) extends Scan {

  override def readSchema(): StructType = cdcSchema

  override def description(): String =
    s"graft-snapshot-changes $table (key=$key)"

  override def toBatch: Batch = new Batch {
    private val from = fromOpt.getOrElse(throw new IllegalArgumentException(
      "batch changes read needs .option(\"fromVersion\", <v >= 1>) — " +
        "(fromVersion, toVersion] is the commit range served"))
    private val to = toOpt.getOrElse(SnapshotTable.currentVersion(table))

    // materialize ONCE per scan instance: planInputPartitions may be
    // invoked several times (stats estimation, AQE, exec planning) and
    // a re-materialize under overwrite changes the part-file NAMES out
    // from under partitions already planned (FILE_NOT_EXIST at read)
    private lazy val files: Seq[String] = {
      require(from >= 1 && from < to,
        s"need 1 <= fromVersion < toVersion, got ($from, $to]")
      // batch slices stage OUTSIDE the table (tmpdir keyed by identity
      // — deterministic overwrite, no table-side garbage to reclaim)
      SnapshotChanges.materialize(table, key, from, to,
        graft.Stage.dir("graft_changes_", table, key, from, to).getPath)
    }

    override def planInputPartitions(): Array[InputPartition] =
      files.zipWithIndex.map { case (p, i) =>
        FilePartition(i, Array(SnapshotV2.partitionedFile(
          SnapshotTable.FileEntry(p, Map.empty)))): InputPartition
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      Bridge.parquetReaderFactory(
        SparkSession.active, cdcSchema, cdcSchema, Array.empty)
  }

  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SnapshotChangesMicroBatchStream(
      table, cdcSchema, key, fromOpt, maxVersionsPerTrigger)
}

/** Streaming arm: offsets are snapshot versions (same contract as
  * [[SnapshotMicroBatchStream]]); each batch materializes its slice
  * deterministically and serves the files; `commit` reclaims drained
  * staging. `fromVersion` (optional) starts the feed mid-chain —
  * offset fromVersion means "changes after it", so the initial batch
  * is (fromVersion, next] incremental rather than full-state inserts. */
private[sources] class SnapshotChangesMicroBatchStream(
    table: String,
    cdcSchema: StructType,
    key: String,
    startAfter: Option[Long],
    maxVersionsPerTrigger: Option[Long])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit}

  @volatile private var availableNowTarget: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = SnapshotTable.currentVersion(table)

  override def initialOffset(): V2Offset = VersionOffset(startAfter.getOrElse(0L))

  override def deserializeOffset(json: String): V2Offset =
    VersionOffset(json.trim.toLong)

  private def latest(from: Long): V2Offset = {
    val head = math.min(SnapshotTable.currentVersion(table), availableNowTarget)
    VersionOffset(maxVersionsPerTrigger.fold(head)(n => math.min(head, from + n)))
  }

  override def latestOffset(): V2Offset = latest(startAfter.getOrElse(0L))

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset =
    latest(start.asInstanceOf[VersionOffset].version)

  // one materialization per range per stream instance —
  // planInputPartitions can be invoked several times for one batch
  // (planning passes), and re-materializing under overwrite renames
  // the part files out from under already-planned partitions
  private val staged =
    scala.collection.concurrent.TrieMap.empty[(Long, Long), Seq[String]]

  override def planInputPartitions(start: V2Offset, end: V2Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].version
    val to = end.asInstanceOf[VersionOffset].version
    if (to == 0L || from >= to) return Array.empty
    // streaming slices share the table's _cdc_staging root and range
    // naming with the V1 CDC source (one CDC consumer per table — the
    // existing convention), so the stream's own commit() AND vacuum's
    // sweep reclaim them
    val files = staged.getOrElseUpdate((from, to),
      SnapshotChanges.materialize(table, key, from, to,
        s"$table/_cdc_staging/${from}_$to"))
    files.zipWithIndex.map { case (p, i) =>
      FilePartition(i, Array(SnapshotV2.partitionedFile(
        SnapshotTable.FileEntry(p, Map.empty)))): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    Bridge.parquetReaderFactory(
      SparkSession.active, cdcSchema, cdcSchema, Array.empty)

  /** Offset `end` is durable in the WAL: every staged range it covers
    * is drained — reclaim, exactly like the V1 CDC source. */
  override def commit(end: V2Offset): Unit = {
    SnapshotTable.purgeStaging(s"$table/_cdc_staging",
      end.asInstanceOf[VersionOffset].version)
    ()
  }

  override def stop(): Unit = ()
}
