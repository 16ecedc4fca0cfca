package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotTable

/** r18 optimization pin: the API commit path writes its data files
  * through the task-side rolling writer, folding EVERY manifest stat
  * over the write pass itself (one Spark job, no re-read of the
  * just-written bytes) — where it used to write, re-read footer-less,
  * and aggregate. This spec proves the recorded entries are IDENTICAL
  * to what the old aggregation pass computed: per-file min/max for
  * long, string (raw bounds), timestamp (epoch micros), date (epoch
  * days) and double (the CAST(long) truncation) columns, nullCount/
  * rowCount, and the HLL++ distinct estimate with the exact
  * approx_count_distinct estimator (same relativeSD, same hashing).
  */
class TaskSideStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("task-side commit stats equal the re-read aggregation's, column by column") {
    val table = graft.Stage.dir("graft_tss_", "v1").getPath
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
    val df = spark.range(0, 5000)
      .select(
        col("id").as("k"),
        concat(lit("name_"), lpad(col("id") % 97, 4, "0")).as("nm"),
        when(col("id") % 5 === 0, col("id") * 1.5 - 100.0).as("d"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 50).cast("int")).as("dt"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    val stats = Seq("k", "nm", "d", "ts", "dt")
    SnapshotTable.commit(df, table, append = false, statsColumns = stats)
    val m = SnapshotTable.manifest(table, 1L)
    assert(m.files.size == 4, s"want 4 range files, got ${m.files.size}")

    // the OLD pass, replayed over the committed files: footer-less
    // read, group by file, min/max on the casted channels, null/row
    // counts, approx_count_distinct
    val read = spark.read.schema(df.schema).parquet(m.files.map(_.path): _*)
    val aggs = stats.flatMap { c =>
      val v = c match {
        case "nm" => col(c)
        case "ts" => unix_micros(col(c))
        case "dt" => unix_date(col(c)).cast("long")
        case _    => col(c).cast("long")
      }
      Seq(min(v).as(s"__mn_$c"), max(v).as(s"__mx_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nu_$c"),
        approx_count_distinct(col(c)).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__nr")
    val expected = read.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
      .map(r => new java.net.URI(r.getAs[String]("__f")).getPath -> r).toMap
    assert(expected.keySet == m.files.map(_.path).toSet)

    m.files.foreach { f =>
      val r = expected(f.path)
      val nr = r.getAs[Long]("__nr")
      stats.foreach { c =>
        assert(f.nstats(c) == ((r.getAs[Long](s"__nu_$c"), nr)),
          s"nullCount/rowCount for $c in ${f.path}")
        assert(f.dstats(c) == r.getAs[Long](s"__nd_$c"),
          s"HLL++ ndv for $c in ${f.path}: task-side ${f.dstats(c)} vs " +
            s"agg ${r.getAs[Long](s"__nd_$c")}")
        if (c == "nm")
          assert(f.sstats(c) == ((r.getAs[String](s"__mn_$c"), r.getAs[String](s"__mx_$c"))),
            s"string bounds for $c in ${f.path}")
        else if (r.isNullAt(r.fieldIndex(s"__mn_$c")))
          assert(!f.stats.contains(c), s"all-NULL $c must record no range")
        else
          assert(f.stats(c) == ((r.getAs[Long](s"__mn_$c"), r.getAs[Long](s"__mx_$c"))),
            s"range for $c in ${f.path}")
      }
      assert(f.size > 0, s"file size recorded for ${f.path}")
    }
  }

  test("no-stats commit records plain sized entries; empty partitions leave no file") {
    val table = graft.Stage.dir("graft_tss_", "v2").getPath
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
    // 3 rows over 4 partitions: at least one partition is empty
    val df = spark.range(0, 3, 1, 4).select(col("id").as("k"))
    SnapshotTable.commit(df, table, append = false)
    val m = SnapshotTable.manifest(table, 1L)
    assert(m.files.nonEmpty && m.files.size <= 3,
      s"empty write partition must leave no file (got ${m.files.size})")
    assert(m.files.forall(f => f.size > 0 && f.stats.isEmpty && f.dstats.isEmpty))
    val back = spark.read.parquet(m.files.map(_.path): _*)
    assert(back.count() == 3)
  }
}
