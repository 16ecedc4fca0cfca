package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal snapshot-manifest table format — the transactional layer the
  * plain directory layouts (src_partitioned, ann_index_persist,
  * dedup_lsh_incremental's index) lack, and the missing piece of the
  * day-2 story those incremental operators opened: atomic commits,
  * schema history, and time travel over immutable parquet data files.
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
  *   2. the manifest content (schema JSON + absolute-ordered file
  *      list) is fully written to a hidden temp file;
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
  * prior version stays readable forever (time travel) until a
  * retention pass prunes it.
  *
  * Scale posture: the manifest holds one line per data file — metadata
  * proportional to the file count, exactly what a 100 TB table's
  * planning step reads instead of a million-object listing; data files
  * are immutable so appends cost O(new data); and the commit point is
  * one metadata operation regardless of table size.
  */
object SnapshotTable {

  final case class Manifest(version: Long, schema: StructType, files: Seq[String])

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
    val files = Vector.newBuilder[String]
    lines.forEach { l =>
      if (l.startsWith("schema=")) {
        schema = DataType.fromJson(l.stripPrefix("schema=")).asInstanceOf[StructType]
      } else if (l.startsWith("file=")) files += l.stripPrefix("file=")
    }
    require(schema != null, s"manifest v$version of $table carries no schema")
    Manifest(version, schema, files.result())
  }

  /** Commit `df` as the next snapshot. `append=true` carries the parent
    * snapshot's files forward; `append=false` starts the file list
    * fresh (overwrite — old files stay on disk, still referenced by
    * the PARENT manifest, which is what keeps time travel alive).
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
      expectedCurrent: Option[Long] = None): Long = {
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
    val newFiles = {
      val it = Files.list(dataDir)
      try it.iterator().asScala
        .map(_.toAbsolutePath.toString)
        .filter(_.endsWith(".parquet"))
        .toVector.sorted
      finally it.close()
    }
    val parentFiles =
      if (append && current > 0) manifest(table, current).files else Vector.empty
    // 2. full manifest content to a hidden temp file
    Files.createDirectories(manifestDir(table))
    val tmp = manifestDir(table).resolve(s".tmp_v${next}_$token")
    val body = new StringBuilder()
      .append(s"version=$next\n")
      .append(s"parent=$current\n")
      .append(s"mode=${if (append) "append" else "overwrite"}\n")
      .append(s"schema=${df.schema.json}\n")
    (parentFiles ++ newFiles).foreach(f => body.append(s"file=$f\n"))
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
    val m = manifest(table, v)
    if (m.files.isEmpty) spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), m.schema)
    else spark.read.schema(m.schema).parquet(m.files: _*)
  }
}
