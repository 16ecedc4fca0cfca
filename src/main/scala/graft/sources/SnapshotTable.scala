package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal snapshot-manifest table format — the transactional layer the
  * plain directory layouts (src_partitioned, ann_index_persist,
  * dedup_lsh_incremental's index) lack, and the missing piece of the
  * day-2 story those incremental operators opened: atomic commits,
  * schema history, time travel, manifest-level file pruning, and
  * transactional maintenance (compaction, vacuum) over immutable
  * parquet data files.
  *
  * Layout under a table root:
  * {{{
  *   data/v<N>_<token>/part-*.parquet   immutable files of commit N
  *   manifests/v<N>.manifest            the commit record (text lines)
  * }}}
  *
  * The COMMIT is the atomic, exclusive creation of
  * `manifests/v<N>.manifest` — the Delta/Iceberg protocol shape:
  *
  *   1. data files are written first, under a per-attempt
  *      uniquely-tokened directory (two racing writers can never
  *      clobber each other's data; a crashed attempt leaves an orphan
  *      directory no manifest references — invisible to readers);
  *   2. the manifest content (schema JSON + file list, each file
  *      optionally carrying per-column min/max stats) is fully written
  *      to a hidden temp file;
  *   3. publication is `Files.createLink(v<N>.manifest, tmp)` — a hard
  *      link is created atomically and FAILS if the target exists, so
  *      of two writers racing on the same version exactly one wins and
  *      the loser gets a ConcurrentModificationException to retry at
  *      N+1 (an HDFS/object-store deployment swaps this single
  *      primitive for rename-without-overwrite / conditional PUT; every
  *      other step is storage-agnostic).
  *
  * A reader resolves `currentVersion` = max published manifest and
  * loads EXACTLY the manifest's file list with the manifest's schema —
  * never a directory listing — so in-flight commits, orphaned data
  * dirs, and half-written temp manifests are all invisible, and any
  * prior version stays readable (time travel) until `vacuum` prunes it.
  *
  * Scale posture: the manifest holds one line per data file — metadata
  * proportional to the file count, exactly what a 100 TB table's
  * planning step reads instead of a million-object listing; per-file
  * min/max stats make selective scans prune AT THE MANIFEST (the
  * Iceberg headline move — zero data files opened for a miss); data
  * files are immutable so appends cost O(new data); and the commit
  * point is one metadata operation regardless of table size.
  */
object SnapshotTable {

  /** One data file with optional per-column (min, max) stats —
    * integer-typed columns only, which is what clustering keys are. */
  final case class FileEntry(path: String, stats: Map[String, (Long, Long)]) {
    def line: String = {
      val st = stats.toSeq.sortBy(_._1).map { case (c, (lo, hi)) => s"$c:$lo:$hi" }
      (path +: st).mkString("|")
    }
  }

  object FileEntry {
    def parse(s: String): FileEntry = {
      val parts = s.split('|')
      FileEntry(
        parts.head,
        parts.tail.map { st =>
          val Array(c, lo, hi) = st.split(':')
          c -> (lo.toLong, hi.toLong)
        }.toMap)
    }
  }

  final case class Manifest(
      version: Long,
      schema: StructType,
      files: Seq[FileEntry],
      extra: Map[String, String]) {
    /** Files that can contain rows with `col` in [lo, hi]: stats prove
      * absence; a file without stats for the column must be read. */
    def filesFor(col: String, lo: Long, hi: Long): Seq[FileEntry] =
      files.filter(f => f.stats.get(col).forall { case (mn, mx) => mx >= lo && mn <= hi })
  }

  private def manifestDir(table: String): JPath = Paths.get(table, "manifests")

  private def manifestPath(table: String, v: Long): JPath =
    manifestDir(table).resolve(s"v$v.manifest")

  /** Highest published version, 0 if the table does not exist yet. */
  def currentVersion(table: String): Long = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) return 0L
    val it = Files.list(dir)
    try {
      it.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toLong
        }
        .foldLeft(0L)(math.max)
    } finally it.close()
  }

  def manifest(table: String, version: Long): Manifest = {
    val p = manifestPath(table, version)
    require(Files.exists(p), s"snapshot $version of $table is not published")
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
    var schema: StructType = null
    val files = Vector.newBuilder[FileEntry]
    val extra = Map.newBuilder[String, String]
    lines.forEach { l =>
      if (l.startsWith("schema=")) {
        schema = DataType.fromJson(l.stripPrefix("schema=")).asInstanceOf[StructType]
      } else if (l.startsWith("file=")) files += FileEntry.parse(l.stripPrefix("file="))
      else l.split("=", 2) match {
        case Array(k, v) => extra += k -> v
        case _           =>
      }
    }
    require(schema != null, s"manifest v$version of $table carries no schema")
    Manifest(version, schema, files.result(), extra.result())
  }

  /** Commit `df` as the next snapshot. `append=true` carries the parent
    * snapshot's files (with their stats) forward; `append=false` starts
    * the file list fresh (overwrite — old files stay on disk, still
    * referenced by the PARENT manifest, which is what keeps time travel
    * alive until vacuum).
    *
    * `statsColumns` names integer-typed columns whose per-file min/max
    * are recorded in the manifest — ONE aggregation over the
    * just-written files (grouped by input_file_name, map-side
    * combined), the price of listing-free pruning forever after.
    * Cluster the data on the column first (repartitionByRange + local
    * sort) and the ranges become disjoint — each selective read then
    * prunes to ~1 file at the manifest.
    *
    * `expectedCurrent` is the optimistic-concurrency handle: when set,
    * the commit targets exactly `expectedCurrent + 1` and a
    * ConcurrentModificationException means another writer published
    * first — re-read and retry. When unset, the current version is
    * resolved at call time (last-writer-wins race window, fine for a
    * single-writer pipeline).
    *
    * Returns the published version number.
    */
  def commit(
      df: DataFrame,
      table: String,
      append: Boolean,
      expectedCurrent: Option[Long] = None,
      statsColumns: Seq[String] = Nil,
      extra: Map[String, String] = Map.empty): Long = {
    val current = expectedCurrent.getOrElse(currentVersion(table))
    val next = current + 1
    if (append && current > 0) {
      val parent = manifest(table, current)
      require(
        parent.schema.fieldNames.sameElements(df.schema.fieldNames),
        s"append schema ${df.schema.simpleString} does not match " +
          s"snapshot $current's ${parent.schema.simpleString}")
    }
    // 1. data files first, under a per-attempt unique directory: racing
    //    or crashed attempts can only ever orphan their own files
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = Paths.get(table, "data", s"v${next}_$token")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val spark = df.sparkSession
    val newFiles: Vector[FileEntry] =
      if (statsColumns.isEmpty) {
        val it = Files.list(dataDir)
        try it.iterator().asScala
          .map(_.toAbsolutePath.toString)
          .filter(_.endsWith(".parquet"))
          .toVector.sorted.map(FileEntry(_, Map.empty))
        finally it.close()
      } else {
        // one map-side-combined pass over the new files only
        val aggs = statsColumns.flatMap(c =>
          Seq(min(col(c).cast("long")).as(s"__mn_$c"), max(col(c).cast("long")).as(s"__mx_$c")))
        spark.read.parquet(dataDir.toString)
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            FileEntry(
              new java.net.URI(r.getAs[String]("__f")).getPath,
              statsColumns.map(c =>
                c -> (r.getAs[Long](s"__mn_$c"), r.getAs[Long](s"__mx_$c"))).toMap)
          }
          .toVector.sortBy(_.path)
      }
    val parentFiles: Seq[FileEntry] =
      if (append && current > 0) manifest(table, current).files else Vector.empty
    // 2. full manifest content to a hidden temp file
    Files.createDirectories(manifestDir(table))
    val tmp = manifestDir(table).resolve(s".tmp_v${next}_$token")
    val body = new StringBuilder()
      .append(s"version=$next\n")
      .append(s"parent=$current\n")
      .append(s"mode=${if (append) "append" else "overwrite"}\n")
    extra.foreach { case (k, v) => body.append(s"$k=$v\n") }
    body.append(s"schema=${df.schema.json}\n")
    (parentFiles ++ newFiles).foreach(f => body.append(s"file=${f.line}\n"))
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    // 3. atomic-exclusive publication: hard-link creation fails if the
    //    version was already published — exactly one racing writer wins
    try Files.createLink(manifestPath(table, next), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"snapshot $next of $table was published by another writer; re-read and retry")
    }
    Files.deleteIfExists(tmp)
    next
  }

  /** Read a snapshot: the latest by default, any published version for
    * time travel. Loads exactly the manifest's file list under the
    * manifest's schema — never a directory listing. */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(table))
    readFiles(spark, manifest(table, v), m => m.files)
  }

  /** Manifest-level file pruning: load only the files whose recorded
    * [min, max] for `column` intersects [lo, hi] (files without stats
    * are read — stats may only ever SKIP provably-absent files). The
    * residual row filter still applies downstream; what the manifest
    * eliminates is opening the non-matching files at all. */
  def readPruned(
      spark: SparkSession,
      table: String,
      column: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(table))
    readFiles(spark, manifest(table, v), _.filesFor(column, lo, hi))
  }

  private def readFiles(
      spark: SparkSession,
      m: Manifest,
      select: Manifest => Seq[FileEntry]): DataFrame = {
    val files = select(m).map(_.path)
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), m.schema)
    else spark.read.schema(m.schema).parquet(files: _*)
  }

  /** INCREMENTAL read — the change-scan between two snapshots (the
    * Iceberg incremental-read shape): data files are immutable and an
    * append commit only ADDS files, so the rows added in versions
    * (from, to] are exactly the files in `to`'s manifest that `from`'s
    * lacks. This is what makes day-2 pipelines (pipe_incremental_refresh,
    * dedup_lsh_incremental) cheap against a snapshot table: the delta
    * is resolved from two manifests — no diff scan of the table, no
    * modified-time heuristics. Every commit in (from, to] must be an
    * append; an overwrite breaks new-files == new-rows and fails
    * loudly here rather than returning a wrong delta. */
  def readIncremental(
      spark: SparkSession,
      table: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion < toVersion, s"need fromVersion < toVersion, got $fromVersion >= $toVersion")
    ((fromVersion + 1) to toVersion).foreach { v =>
      val mode = manifest(table, v).extra.getOrElse("mode", "?")
      require(mode == "append", s"snapshot $v of $table is mode=$mode, not append — " +
        "incremental read is only sound across a pure append chain")
    }
    val m = manifest(table, toVersion)
    val old = manifest(table, fromVersion).files.map(_.path).toSet
    readFiles(spark, m, _.files.filterNot(f => old(f.path)))
  }

  /** TRANSACTIONAL compaction — the maintenance pass incremental
    * writers need, done the snapshot way: rewrite the current
    * snapshot's many small files into ceil(bytes/targetBytes) files and
    * publish the result as a NEW snapshot (mode=overwrite, identical
    * rows). Readers in flight keep their version; time travel still
    * reaches the fragmented history; vacuum reclaims it later. Unlike
    * GraftSinks.compact's in-place directory swap there is NO window
    * where the table does not exist. Returns (filesBefore, version). */
  def compactSnapshot(
      spark: SparkSession,
      table: String,
      targetBytes: Long = 128L << 20,
      statsColumns: Seq[String] = Nil): (Int, Long) = {
    val cur = currentVersion(table)
    val m = manifest(table, cur)
    require(m.files.nonEmpty, s"$table snapshot $cur has no files to compact")
    val bytes = m.files.map(f => Files.size(Paths.get(f.path))).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val v = commit(
      read(spark, table, Some(cur)).coalesce(n),
      table,
      append = false,
      expectedCurrent = Some(cur),
      statsColumns = statsColumns,
      extra = Map("compacted-from" -> cur.toString))
    (m.files.size, v)
  }

  /** Exactly-once streaming append — the foreachBatch body for a
    * Structured Streaming sink onto a snapshot table: each micro-batch
    * commits as an APPEND snapshot carrying its batch id in the
    * manifest, and a REPLAYED batch (restart after a crash between the
    * sink commit and the checkpoint advance — the classic
    * at-least-once window) is detected by `batchId <=` the last
    * committed id and skipped, so replay is idempotent. The
    * transactionless-store equivalent lives in
    * StreamingCatalog.foreachBatchDeltaUpsert (deterministic overwrite
    * paths); this is the same guarantee carried by the commit protocol
    * itself. Returns false when the batch was a skipped replay. */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Boolean = {
    val cur = currentVersion(table)
    val last =
      if (cur == 0) -1L
      else manifest(table, cur).extra.get("batchid").map(_.toLong).getOrElse(-1L)
    if (batchId <= last) false
    else {
      commit(
        df,
        table,
        append = cur > 0,
        expectedCurrent = Some(cur),
        extra = Map("batchid" -> batchId.toString))
      true
    }
  }

  /** Retention: keep the last `retainLast` snapshots, delete older
    * manifests, then delete every data file under data/ that (a) no
    * retained manifest references and (b) belongs to an attempt for a
    * version <= the newest retained one — rule (b) is what protects an
    * IN-FLIGHT writer's freshly-written v<current+1> directory, which
    * is unreferenced by construction until its manifest publishes.
    * Returns (manifestsDeleted, dataFilesDeleted). */
  def vacuum(table: String, retainLast: Int = 2): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val cur = currentVersion(table)
    if (cur == 0) return (0, 0)
    val keep = ((cur - retainLast + 1) max 1) to cur
    val referenced = keep.flatMap(v => manifest(table, v).files.map(_.path)).toSet
    var mDel = 0
    (1L until keep.head).foreach { v =>
      if (Files.deleteIfExists(manifestPath(table, v))) mDel += 1
    }
    var fDel = 0
    val dataRoot = Paths.get(table, "data")
    if (Files.isDirectory(dataRoot)) {
      val dirs = { val s = Files.list(dataRoot); try s.iterator().asScala.toVector finally s.close() }
      dirs.foreach { d =>
        val name = d.getFileName.toString // v<N>_<token>
        val v = name.stripPrefix("v").takeWhile(_.isDigit)
        if (v.nonEmpty && v.toLong <= cur) {
          val fs = { val s = Files.list(d); try s.iterator().asScala.toVector finally s.close() }
          fs.foreach { f =>
            if (!referenced(f.toAbsolutePath.toString)) {
              Files.deleteIfExists(f); fDel += 1
            }
          }
          if ({ val s = Files.list(d); try !s.iterator().hasNext finally s.close() })
            Files.deleteIfExists(d)
        }
      }
    }
    (mDel, fDel)
  }
}
