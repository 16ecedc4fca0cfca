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

  test("Main.run refuses an existing database path (main.rs:252-256)") {
    val existing = Files.createTempDirectory("graft-main-existing").toString
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, "/dev/null", existing)
    }
    assert(e.getMessage.contains("already created database"))
  }
}
