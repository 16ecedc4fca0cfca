package graft

import java.nio.file.Files

import graft.sources.{GraftJdbcSink, GraftSinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("partitioned parquet roundtrip + partition pruning") {
    val li = Tables(spark, sf).lineitem
    val path = tmp("graft_parquet")
    GraftSinks.parquet(li, path, Seq("l_returnflag"))
    val back = spark.read.parquet(path)
    assert(back.count() === li.count())
    // a partition-key predicate must prune to the matching directory
    val pruned = back.filter(col("l_returnflag") === "R")
    val partFilters = PlanCheck
      .fileScans(pruned)
      .flatMap(_.partitionFilters)
      .flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
    assert(partFilters.contains("l_returnflag"), PlanCheck.render(pruned))
    assert(
      back.filter(col("l_returnflag") === "R").count() ===
        li.filter(col("l_returnflag") === "R").count())
  }

  test("compaction merges a fragmented table without losing a row") {
    val docs = Tables(spark, sf).documents
    val path = tmp("graft_compact")
    docs.repartition(64).write.mode("overwrite").parquet(path)
    val expected = docs.count()
    val (before, after) = GraftSinks.compact(spark, path, targetBytes = 1L << 30)
    assert(before === 64, "fixture should start fragmented")
    assert(after === 1, "everything fits one target-sized file")
    val back = spark.read.parquet(path)
    assert(back.count() === expected)
    assert(back.columns.sorted === docs.columns.sorted)
    // scratch/backup dirs must not survive the swap
    val parent = new java.io.File(path).getParentFile
    assert(!new java.io.File(path + ".compact_tmp").exists(), parent.list().mkString(","))
    assert(!new java.io.File(path + ".compact_old").exists(), parent.list().mkString(","))
  }

  test("csv and json writer roundtrips") {
    val n = Tables(spark, sf).nation
    val cPath = tmp("graft_csv")
    val jPath = tmp("graft_json")
    GraftSinks.csv(n, cPath)
    GraftSinks.json(n, jPath)
    val c = spark.read.option("header", "true").schema(n.schema).csv(cPath)
    val j = spark.read.schema(n.schema).json(jPath)
    assert(c.orderBy("n_nationkey").collect() === n.orderBy("n_nationkey").collect())
    assert(j.orderBy("n_nationkey").collect() === n.orderBy("n_nationkey").collect())
  }

  test("jdbc sink: full shred -> real .duckdb file -> reopen + count (main.rs:274-310)") {
    // the reference's end artifact is an indexed DuckDB database; with
    // the DuckDB JDBC driver on the classpath this is the genuine
    // equivalent: shred all 6 tables, write through JDBC, reopen, count
    val loadable =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false }
    assume(loadable, "DuckDB JDBC driver not on the test classpath")
    val url = s"jdbc:duckdb:${tmp("graft_duckdb")}/graft.duckdb"
    val shredded = graft.wikidata.WikidataShredder
      .shred(graft.wikidata.SyntheticDump.entities(spark, sf))
    try {
      shredded.all.foreach { case (name, df) =>
        GraftJdbcSink.write(df, url, name, batchSize = 50)
      }
      val conn = java.sql.DriverManager.getConnection(url)
      try shredded.all.foreach { case (name, df) =>
        val st = conn.createStatement()
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $name")
        try { rs.next(); assert(rs.getLong(1) === df.count(), s"table $name") }
        finally { rs.close(); st.close() }
      } finally conn.close()
    } finally GraftCache.clear()
  }

  test("jdbc sink: DuckDB-shaped DDL + batched write to embedded Derby") {
    val n = Tables(spark, sf).nation
    val url = "jdbc:derby:memory:graftdb;create=true"
    assert(
      GraftJdbcSink.ddlFor("nation", n.schema) ===
        "CREATE TABLE nation (n_nationkey INTEGER, n_name VARCHAR(4096), n_regionkey INTEGER)")
    GraftJdbcSink.write(n, url, "nation", batchSize = 7)
    val back = spark.read.jdbc(url, "nation", new java.util.Properties())
    assert(back.count() === 25)
    assert(
      back.orderBy("N_NATIONKEY").select("N_NAME").collect().map(_.getString(0)).toSeq ===
        n.orderBy("n_nationkey").select("n_name").collect().map(_.getString(0)).toSeq)
  }
}
