package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output side of §2.3. Parquet (partitioned, zstd) is the scale-path
  * sink; csv/json are interchange writers. All are thin, deliberate
  * wrappers — the point is the layout decisions, not the API.
  */
object GraftSinks {

  /** Partitioned parquet — the 100 TB posture: partition columns become
    * directory pruning keys (e.g. the shredded edge table partitioned by
    * a property_id bucket; a predicate on the key prunes to one
    * directory, see SURVEY §4). */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Small-files compaction — the maintenance pass every long-lived
    * table needs: streaming/incremental writers (foreachBatch upserts,
    * per-trigger appends) accrete many small parquet files, and at
    * 100 TB an over-fragmented table wastes task-scheduling overhead
    * and row-group metadata reads on every downstream scan.
    *
    * Rewrites a FLAT parquet directory into ceil(bytes/targetBytes)
    * files via coalesce (merge-only, NO shuffle — compaction never
    * needs one), into a scratch dir first, then an atomic-as-the-FS
    * allows swap (rename old aside, rename scratch in, drop old). A
    * reader in flight sees either layout, never a half-written one.
    * Partitioned layouts run this per leaf directory; an object-store
    * deployment would swap a manifest/version pointer instead of
    * renaming (the parquet rewrite itself is identical).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val scratch = new Path(path + ".compact_tmp")
    val old = new Path(path + ".compact_old")
    // Crash recovery: a previous compact that died between its two
    // renames leaves the table stranded at .compact_old with nothing at
    // `path` — restore the backup before proceeding instead of failing
    // on the missing dir. (The swap below still has a brief window where
    // `path` does not exist; readers must tolerate it, or an
    // object-store deployment swaps a manifest pointer instead.)
    if (!fs.exists(dir) && fs.exists(old)) {
      if (!fs.rename(old, dir)) sys.error(s"compact: crash recovery rename $old -> $dir failed")
    }
    val before = dataFiles(dir)
    require(before.nonEmpty, s"$path has no parquet data files to compact")
    val n = math.max(1, math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    fs.delete(scratch, true)
    fs.delete(old, true)
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(scratch.toString)
    val after = dataFiles(scratch).length
    if (!fs.rename(dir, old)) sys.error(s"compact: could not move $dir aside")
    if (!fs.rename(scratch, dir)) { fs.rename(old, dir); sys.error(s"compact: swap failed for $dir") }
    fs.delete(old, true)
    (before.length, after)
  }
}
