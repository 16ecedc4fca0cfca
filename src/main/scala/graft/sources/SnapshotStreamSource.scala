package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow}
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
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      metadataPath)
}

object SnapshotSourceProvider {
  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot source needs .option(\"path\", <table root>)"))

  /** `spark.readStream.format(...)` needs the provider CLASS name. */
  val format: String = classOf[SnapshotSourceProvider].getName
}

/** The planned-offset HIGH-WATER MARK, persisted beside Spark's own
  * checkpoint state under the source's metadataPath. Why it must
  * persist: the admission cursor (`planned`) caps getOffset at
  * `planned + maxVersionsPerTrigger`, and after a restart where the
  * last batch was already committed Spark calls getOffset BEFORE any
  * getBatch — a cursor re-seeded at 0 would report an offset BELOW the
  * committed position, MicroBatchExecution would see the offset
  * regress, and already-processed version slices would be redelivered
  * as NEW batch ids (appendBatch's replay guard keys on batch id, so
  * the duplicates would land). One small file, rewritten per planned
  * batch, read once at source construction. */
private[sources] final class HighWaterMark(metadataPath: String, conf: org.apache.hadoop.conf.Configuration) {
  // an empty metadataPath (direct construction in tests / embedding)
  // means NO persistence at all — the cursor is purely in-memory and
  // the filesystem is never touched. Without this guard the write path
  // would be "/graft-highwater": the filesystem root.
  private val persistent = metadataPath.nonEmpty
  private lazy val io = new HadoopSnapshotIO(conf)
  private val path = s"$metadataPath/graft-highwater"
  /** Last persisted planned offset; 0 when nothing was persisted. A
    * truncated/garbled file (crash mid-write under a pre-atomic layout)
    * degrades to 0 with a warning rather than wedging the source at
    * construction — under-reporting `planned` only re-plans a batch,
    * which the offset WAL already dedupes. */
  def load(): Long =
    if (!persistent || !io.exists(path)) 0L
    else try io.readString(path).trim.toLong
    catch {
      case _: NumberFormatException =>
        System.err.println(
          s"[graft] WARN unparseable high-water mark at $path — treating as 0 (a batch may be re-planned)")
        0L
    }
  def advance(to: Long, current: Long): Long = {
    val n = math.max(current, to)
    if (n > current && persistent) io.writeStringAtomic(path, n.toString)
    n
  }
}

private[sources] class SnapshotSource(
    sqlContext: SQLContext,
    table: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: String = "") extends Source with SupportsTriggerAvailableNow {

  // admission-control cursor: the last offset a batch was planned up
  // to, advanced in getBatch and PERSISTED under metadataPath — on
  // restart it recovers at the last planned position so the reported
  // offset can never fall below the committed one (see HighWaterMark)
  private val hwm =
    new HighWaterMark(metadataPath, sqlContext.sparkSession.sessionState.newHadoopConf())
  @volatile private var planned = hwm.load()

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

  // ---- Trigger.AvailableNow admission support (r19) -------------------
  // Without SupportsTriggerAvailableNow, MicroBatchExecution falls back
  // to SINGLE BATCH execution for AvailableNow (with a warning per
  // query) — one unbounded batch instead of a terminating bounded-batch
  // drain. The target version is FIXED at prepare time (the AvailableNow
  // contract: data committed during the run is not picked up, so a busy
  // producer can never wedge the drain), and the per-batch admission cap
  // (maxVersionsPerTrigger) still applies through `planned`. With
  // SupportsAdmissionControl present, the engine calls latestOffset for
  // EVERY trigger type, so the un-prepared path mirrors getOffset.
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SnapshotTable.currentVersion(table))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset = {
    val v = availableNowTarget.getOrElse(SnapshotTable.currentVersion(table))
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(v, planned + n)
      case None    => v
    }
    if (capped == 0L) null else LongOffset(capped)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = version(end)
    planned = hwm.advance(to, planned)
    val m = SnapshotTable.manifest(table, to)
    val entries = start.map(version).filter(_ > 0L) match {
      case None =>
        // initial load: everything the table held up to `to` is the
        // base batch — resolved from to's manifest alone
        m.files
      case Some(from) if from >= to => Seq.empty
      case Some(from) =>
        // slice files live in `to`'s manifest (append-only chains) —
        // resolve their ENTRIES, whose commit seq the delete scoping
        // below depends on
        val paths = SnapshotTable.incrementalFiles(table, from, to).toSet
        m.files.filter(f => paths(f.path))
    }
    // the plan must carry streaming leaves (MicroBatchExecution asserts
    // it) while staying a declarative parquet relation — the Bridge
    // shim builds exactly what FileStreamSource hands back; both delete
    // formats apply, SEQ-SCOPED (see SnapshotStreamState.batch)
    SnapshotStreamState.batch(sqlContext.sparkSession, table, m, schema, entries)
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

/** The snapshot table's CHANGE FEED as a Structured Streaming source —
  * Delta's readChangeFeed, and the general-commit sibling of
  * [[SnapshotSourceProvider]]: where the append-only source refuses any
  * non-append commit (new-files != new-rows), this one emits the
  * row-level difference of each version transition — insert / delete /
  * update_preimage / update_postimage — computed from table STATES via
  * [[SnapshotTable.changeFeed]], so it stays SOUND across merge,
  * deletion-vector deletes, rollback, overwrite and compaction (a
  * compaction transition correctly emits nothing). Requires
  * `.option("key", <column>)` — the identity the diff is keyed on.
  *
  * Offsets are snapshot versions, exactly like the append source, so
  * Spark's checkpointed offset WAL carries commit-chain positions and
  * a restart replays the same (start, end] slice. Replay idempotence:
  * each slice's change rows are MATERIALIZED deterministically under
  * `_cdc_staging/<from>_<to>` (mode=overwrite — a replayed range
  * rewrites identical content from the same immutable manifests), then
  * handed to Spark as a streaming parquet relation; the initial batch
  * (no start offset) is the head state as `insert` rows, served
  * straight off the manifest's file list with deletion vectors applied
  * — no materialization of the full table.
  *
  * Scale posture: getOffset is one metadata listing; each transition
  * costs one key-partitioned full-outer join of two manifest-resolved
  * states (co-partitioned when the table is key-clustered, which merge
  * maintains) writing change-sized output. For pure-append tables the
  * plain snapshot source is strictly cheaper — this is the arm for
  * tables that UPDATE. */
class SnapshotCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot-cdc"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "the CDC source derives its schema from the table — drop .schema()")
    val table = SnapshotCdcSourceProvider.tableOf(parameters)
    val v = SnapshotTable.currentVersion(table)
    require(v > 0, s"snapshot table $table has no published version yet")
    (shortName(), SnapshotCdcSourceProvider.cdcSchema(SnapshotTable.manifest(table, v).schema))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotCdcSource(
      sqlContext,
      SnapshotCdcSourceProvider.tableOf(parameters),
      parameters.getOrElse("key",
        throw new IllegalArgumentException("CDC source needs .option(\"key\", <column>)")),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      metadataPath)
}

object SnapshotCdcSourceProvider {
  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot CDC source needs .option(\"path\", <table root>)"))

  private[sources] def cdcSchema(table: StructType): StructType =
    StructType(
      org.apache.spark.sql.types.StructField(
        "_change_type", org.apache.spark.sql.types.StringType, nullable = true)
        +: table.fields.toSeq)

  /** `spark.readStream.format(...)` needs the provider CLASS name. */
  val format: String = classOf[SnapshotCdcSourceProvider].getName
}

private[sources] class SnapshotCdcSource(
    sqlContext: SQLContext,
    table: String,
    key: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: String = "") extends Source with SupportsTriggerAvailableNow {

  import org.apache.spark.sql.functions.{col, lit}

  // persisted admission cursor — same restart contract as
  // SnapshotSource (see HighWaterMark): the reported offset must never
  // fall below the committed position after a recovery
  private val hwm =
    new HighWaterMark(metadataPath, sqlContext.sparkSession.sessionState.newHadoopConf())
  @volatile private var planned = hwm.load()

  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.currentVersion(table)
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(v, planned + n)
      case None    => v
    }
    if (capped == 0L) None else Some(LongOffset(capped))
  }

  // Trigger.AvailableNow admission support — same shape and rationale
  // as [[SnapshotSource]] (target fixed at prepare, per-batch cap via
  // `planned`, latestOffset mirrors getOffset when un-prepared).
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SnapshotTable.currentVersion(table))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset = {
    val v = availableNowTarget.getOrElse(SnapshotTable.currentVersion(table))
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(v, planned + n)
      case None    => v
    }
    if (capped == 0L) null else LongOffset(capped)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val to = version(end)
    planned = hwm.advance(to, planned)
    start.map(version).filter(_ > 0L) match {
      case None =>
        // initial load: the head STATE as insert rows — streaming
        // parquet relation off the manifest with BOTH delete formats
        // applied, seq-scoped (stream-static left_anti is stateless)
        val m = SnapshotTable.manifest(table, to)
        SnapshotStreamState.batch(spark, table, m, m.schema, m.files)
          .select(
            lit("insert").as("_change_type") +: m.schema.fieldNames.toSeq.map(col): _*)
      case Some(from) if from >= to =>
        org.apache.spark.sql.graftbridge.Bridge
          .streamingParquetBatch(spark, Nil, schema)
      case Some(from) =>
        // one INCREMENTAL diff per version transition (r14: upgraded
        // from the state-based changeFeed — each transition now costs
        // O(its touched files + DV-hit carried files), not a
        // full-state full-outer join; Round26Spec pins per-commit
        // equivalence), materialized under a deterministic range-keyed
        // path: a WAL replay overwrites the SAME content (immutable
        // manifests), then streams it back
        val staging = s"$table/_cdc_staging/${from}_$to"
        SnapshotTable.changeFeedIncremental(spark, table, from, to, key)
          .drop("_commit_version")
          .write.mode("overwrite").parquet(staging)
        val files = LocalSnapshotIO.list(staging)
          .filter(_.endsWith(".parquet")).sorted.map(n => s"$staging/$n")
        org.apache.spark.sql.graftbridge.Bridge
          .streamingParquetBatch(spark, files, schema)
    }
  }

  private def version(o: Offset): Long = o match {
    case LongOffset(v)       => v
    case SerializedOffset(j) => j.trim.toLong
    case other               => other.json().trim.toLong
  }

  /** Post-commit staging reclamation: Spark calls this once offset
    * `end` is durable in the commit log — no replay at or below it can
    * ever happen, and a replay ABOVE it re-materializes its slice in
    * getBatch (mode=overwrite) before reading, so every staged range
    * `end` covers is dead weight. This is what bounds a long-lived
    * stream's staging footprint to the in-flight batch instead of the
    * table's entire change history (one directory per micro-batch,
    * forever — ~43k dirs for a month at a 1-minute trigger). Offline
    * sweep for streams that died undrained: vacuum's retention arm. */
  override def commit(end: Offset): Unit = {
    SnapshotTable.purgeStaging(s"$table/_cdc_staging", version(end))
    ()
  }

  override def stop(): Unit = ()
}

/** ATTACH-TIME / SLICE table state as a STREAMING frame with both
  * delete formats applied — shared by the append-only source (initial
  * load AND steady-state slices) and the CDC source's initial load.
  *
  * Equality DVs apply SEQ-SCOPED, exactly like every batch read path:
  * a DV stamped at commit s kills only rows from files with seq < s.
  * The previous unscoped `key IN dv` anti-join silently killed (a) the
  * post-images a mergeMoR commit appends beside its own DV (a fresh
  * attach after an upsert lost the upserted rows), and (b) rows
  * RE-APPENDED after a deleteKeys commit, in both the initial batch
  * and later slices — found by inspection this round, pinned in
  * Round50Spec. Files group by commit seq (one streaming scan per
  * distinct seq over disjoint file sets — same total I/O), and the DV
  * side carries each sidecar's seq.
  *
  * Position sidecars anti-join on TRUE per-file ordinals taken from
  * the scan itself (`_metadata.row_index`, scheme-normalized path) —
  * the same shape the selective rewrite reads by — so a pos-carrying
  * table now attaches instead of refusing; steady-state slices only
  * ever see files appended after the sidecars (append-only chains),
  * where the anti-join is a provable no-op. */
private[sources] object SnapshotStreamState {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._
  import scala.jdk.CollectionConverters._

  def batch(
      spark: SparkSession,
      table: String,
      m: SnapshotTable.Manifest,
      schema: StructType,
      entries: Seq[SnapshotTable.FileEntry]): DataFrame = {
    def scan(paths: Seq[String]): DataFrame = org.apache.spark.sql.graftbridge
      .Bridge.streamingParquetBatch(spark, paths, schema)
    if (entries.isEmpty) return scan(Nil)
    // RENAME-EPOCH GUARD (r17 advisory, high): the streaming scan reads
    // parquet BY NAME under the current-name schema — a file written
    // before a column rename holds the OLD physical name and would
    // read the renamed column as silent NULLs (the exact failure the
    // batch routes' epoch dispatch exists to prevent). Until the
    // streaming relation grows the same positional dispatch, refuse
    // loudly: a compaction (which rewrites every file under current
    // names) re-admits the stream. Steady-state slices of files
    // appended after the rename pass untouched.
    locally {
      val cur = m.schema.fieldNames.toSeq
      val stale = entries.filter(f =>
        SnapshotTable.namesAt(m, math.max(f.seq, 0L)) != cur)
      require(stale.isEmpty,
        s"streaming read of $table refused: ${stale.size} file(s) predate a " +
          "column rename and would serve the renamed column as NULL under " +
          "the current-name schema — compactSnapshot (rewrites files under " +
          "current names) before streaming this slice")
    }
    val posRefs = SnapshotTable.posDvRefs(m)
    // Only sidecars whose recorded named-file byte range may cover one
    // of THIS scan's files load and anti-join (readFiles' posHit rule;
    // a rangeless legacy ref proves nothing and always applies).
    // Steady-state slices — files appended strictly after every
    // sidecar — now scan clean instead of paying a provable-no-op
    // sidecar load + anti-join per micro-batch (r17 advisory, low).
    def posHitFor(fs: Seq[SnapshotTable.FileEntry]): Seq[SnapshotTable.PosDvRef] =
      posRefs.filter(r => fs.exists(f =>
        r.range.forall { case (lo, hi) =>
          SnapshotTable.FileEntry.bytesLe(lo, f.path) &&
            SnapshotTable.FileEntry.bytesLe(f.path, hi)
        }))
    def stripPos(fs: Seq[SnapshotTable.FileEntry])(df: DataFrame): DataFrame = {
      val hit = posHitFor(fs)
      if (hit.isEmpty) df
      else {
        val del = hit.map(r => spark.read
            .schema(SnapshotV2.PosSidecarSchema).parquet(r.path).select(
            col("_file").cast("string").as("__g_pdf"),
            col("_pos").cast("long").as("__g_pdp")))
          .reduce(_.unionByName(_))
        // delete-batch-derived side: structural shuffle hint
        df.select(col("*"),
            regexp_replace(col("_metadata.file_path"), "^file:/*", "/").as("__g_pf"),
            col("_metadata.row_index").as("__g_pp"))
          .join(del.hint("shuffle_hash"),
            col("__g_pf") === col("__g_pdf") && col("__g_pp") === col("__g_pdp"),
            "left_anti")
          .drop("__g_pf", "__g_pp")
      }
    }
    val dvRefs = SnapshotTable.dvRefs(m)
    if (dvRefs.isEmpty) stripPos(entries)(scan(entries.map(_.path)))
    else {
      val k = SnapshotTable.dvKeyOf(m).getOrElse(throw new IllegalStateException(
        s"snapshot table $table has deletion-vector files but no dvkey in " +
          "its manifest — corrupt metadata"))
      require(schema.fieldNames.contains(k),
        s"stream schema must include the deletion-vector key column '$k' " +
          s"(got ${schema.fieldNames.mkString(",")}) — DVs cannot be applied " +
          "without it")
      val seqs = entries.map(f => math.max(f.seq, 0L)).distinct
      val base = if (seqs.size == 1)
        stripPos(entries)(scan(entries.map(_.path)))
          .withColumn("__g_fseq", lit(seqs.head))
      else {
        // ONE streaming scan regardless of outstanding commit count
        // (r19): rows tag their file's commit seq through a broadcast
        // (path -> seq) attach — the V1 streaming analog of the V2
        // route's per-file FileSeqMetaKey constant — instead of one
        // scan per distinct seq unioned, whose plan width grew with
        // commits since the last compaction. INNER join on the
        // scan-normalized path: a mismatch loses rows loudly (oracle)
        // instead of null-fseq'ing the DV scope silently.
        val seqDf = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            entries.map(f => org.apache.spark.sql.Row(
              f.path, math.max(f.seq, 0L))).asJava),
          StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "__g_fpm", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField(
              "__g_fseq", org.apache.spark.sql.types.LongType))))
        // path (and, when sidecars may hit, the row ordinal) must be
        // captured in ONE select on the scan itself — metadata columns
        // resolve only there, never through a join
        val hit = posHitFor(entries)
        val scan0 = scan(entries.map(_.path)).select(
          col("*") +:
            regexp_replace(col("_metadata.file_path"), "^file:/*", "/")
              .as("__g_pf") +:
            (if (hit.isEmpty) Nil
             else Seq(col("_metadata.row_index").as("__g_pp"))): _*)
        val afterPos =
          if (hit.isEmpty) scan0
          else {
            val del = hit.map(r => spark.read
                .schema(SnapshotV2.PosSidecarSchema).parquet(r.path).select(
                col("_file").cast("string").as("__g_pdf"),
                col("_pos").cast("long").as("__g_pdp")))
              .reduce(_.unionByName(_))
            scan0.join(del.hint("shuffle_hash"),
                col("__g_pf") === col("__g_pdf") && col("__g_pp") === col("__g_pdp"),
                "left_anti")
              .drop("__g_pp")
          }
        afterPos.join(broadcast(seqDf), col("__g_pf") === col("__g_fpm"))
          .drop("__g_pf", "__g_fpm")
      }
      val kSchema = StructType(Seq(m.schema(k).copy(nullable = true)))
      val dv = dvRefs.map(r => spark.read.schema(kSchema).parquet(r.path)
          .select(col(k).as("__g_dvk"), lit(r.seq).as("__g_dvq")))
        .reduce(_.unionByName(_))
      base.join(dv.hint("shuffle_hash"),
          base(k) === col("__g_dvk") && col("__g_dvq") > col("__g_fseq"),
          "left_anti")
        .drop("__g_fseq")
    }
  }
}
