package graft

import java.nio.file.Files

import graft.wikidata.{ShreddedLayout, SyntheticDump, WikidataShredder}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** ShreddedLayout round trip: the partition-by-property-bucket +
  * sorted-by-src_id write IS the reference's index analog
  * (value.rs:332-350), so assert the two index properties on real
  * plans/files: (1) a property predicate prunes to one directory at
  * planning time; (2) src_id is sorted within every written file (tight
  * row-group min/max = row-group skipping on src_id).
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val base: String = {
    val dir = Files.createTempDirectory("graft-layout-spec").toString
    ShreddedLayout.write(WikidataShredder.shred(SyntheticDump.entities(spark, sf)), dir)
    dir
  }

  test("read-back row counts match the shredded source tables") {
    val sh = WikidataShredder.shred(SyntheticDump.entities(spark, sf))
    sh.all.foreach { case (name, df) =>
      assert(
        ShreddedLayout.read(spark, base, name).count() === df.count(),
        s"table $name round-trip count")
    }
  }

  test("property predicate prunes partitions at planning time") {
    // numFiles is a planning-time scan metric, so it reflects directory
    // pruning (DataFrame.inputFiles does not — it lists the relation)
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      val plan = df.queryExecution.executedPlan
      df.collect()
      val scan = plan.collectFirst { case f: FileSourceScanExec => f }
      assert(scan.isDefined, plan.toString)
      scan.get.metrics("numFiles").value
    }
    val full = ShreddedLayout.read(spark, base, "edge")
    val pruned = ShreddedLayout.forProperty(spark, base, "edge", 1000000031L)
    val scan = pruned.queryExecution.executedPlan.collectFirst { case f: FileSourceScanExec => f }
    // partition filter present on the bucket column...
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "p_bucket")))
    // ...and it actually pruned: strictly fewer files than the full scan
    assert(filesScanned(pruned) < filesScanned(full))
    // pruning did not lose rows (P31-analog edges: one per nation + one per region)
    assert(pruned.count() === full.filter(full("property_id") === 1000000031L).count())
  }

  test("src_id is sorted within every written edge file") {
    ShreddedLayout.read(spark, base, "edge").inputFiles.foreach { f =>
      val ids = spark.read.parquet(f).select("src_id").collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"file $f not sorted by src_id")
    }
  }

  test("vertex is sorted by id within files") {
    ShreddedLayout.read(spark, base, "vertex").inputFiles.foreach { f =>
      val ids = spark.read.parquet(f).select("id").collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"file $f not sorted by id")
    }
  }
}
