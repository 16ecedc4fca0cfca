package graft

import java.nio.file.Files

import graft.wikidata.{ShreddedLayout, SyntheticDump}
import org.scalatest.funsuite.AnyFunSuite

/** The CLI path end-to-end: dump file -> Main.run -> reopen the artifact
  * and query it (the reference's whole workflow, main.rs:246-326). */
class MainSpec extends AnyFunSuite {
  import TestSpark._

  test("Main.run shreds a dump file into a queryable artifact") {
    val dumpFile = Files.createTempDirectory("graft-main-dump").resolve("dump.jsonl")
    val lines = SyntheticDump.lines(spark, sf).collect()
    Files.write(dumpFile, String.join("\n", lines: _*).getBytes("UTF-8"))

    val db = Files.createTempDirectory("graft-main-out").resolve("db").toString
    Main.run(spark, dumpFile.toString, db)

    // reopen: all 6 tables exist and the vertex count matches the dump
    val vertex = ShreddedLayout.read(spark, db, "vertex")
    assert(vertex.count() === 32)
    assert(ShreddedLayout.read(spark, db, "edge").count() > 0)
    Seq("string", "quantity", "coordinates", "time").foreach { t =>
      assert(ShreddedLayout.read(spark, db, t).count() === (if (t == "string") 101 else 25))
    }
  }

  test("Main.run writes the reference's literal artifact: an indexed .duckdb file") {
    val loadable =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false }
    assume(loadable, "DuckDB JDBC driver not on the test classpath")
    val dumpFile = Files.createTempDirectory("graft-main-ddb").resolve("dump.jsonl")
    val lines = SyntheticDump.lines(spark, sf).collect()
    Files.write(dumpFile, String.join("\n", lines: _*).getBytes("UTF-8"))
    val db = Files.createTempDirectory("graft-main-ddbout").resolve("wd.duckdb").toString
    try Main.run(spark, dumpFile.toString, db)
    finally GraftCache.clear()
    val conn = java.sql.DriverManager.getConnection(s"jdbc:duckdb:$db")
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery("SELECT COUNT(*) FROM vertex")
      rs.next(); assert(rs.getLong(1) === 32); rs.close()
      // the reference's exact index set: src_id/dst_id per claim table
      val idx = st.executeQuery(
        "SELECT index_name FROM duckdb_indexes() ORDER BY index_name")
      val names = Iterator.continually(idx).takeWhile(_.next()).map(_.getString(1)).toList
      idx.close(); st.close()
      assert(names.contains("edge_src_id_index") && names.contains("edge_dst_id_index"), names)
      assert(names.contains("time_src_id_index") && names.contains("quantity_dst_id_index"), names)
    } finally conn.close()
  }

  test("Main.run refuses an existing database path (main.rs:252-256)") {
    val existing = Files.createTempDirectory("graft-main-existing").toString
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, "/dev/null", existing)
    }
    assert(e.getMessage.contains("already created database"))
  }
}
