package graft

import graft.wikidata.{IdCodec, SyntheticDump, WikidataShredder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-semantics edge cases (file:line cites are to
  * /root/reference). CatalogSpec covers "runs + non-empty"; the DuckDB
  * harness covers full values. */
class WikidataSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val entities = SyntheticDump.entities(spark, sf)
  private lazy val claims = WikidataShredder.claims(entities)

  test("gzip-compressed dumps parse transparently (main.rs:261-269)") {
    import java.nio.file.Files
    import java.util.zip.GZIPOutputStream
    val dir = Files.createTempDirectory("graft_gz")
    val f = dir.resolve("dump.json.gz").toFile
    val out = new GZIPOutputStream(new java.io.FileOutputStream(f))
    SyntheticDump.lines(spark, sf).collect().foreach { l =>
      out.write((l + "\n").getBytes("UTF-8"))
    }
    out.close()
    val fromGz = WikidataShredder.parseFile(spark, f.getAbsolutePath)
    assert(fromGz.count() === entities.count())
    assert(
      WikidataShredder.vertex(fromGz).orderBy("id").collect() ===
        WikidataShredder.vertex(entities).orderBy("id").collect())
  }

  test("malformed lines are skipped, not fatal (main.rs:316-321)") {
    // 25 nations + 5 regions + 1 lexeme + 1 claims-less item; noise vanishes
    assert(entities.count() === 32)
  }

  test("deprecated-rank claims dropped, preferred kept (main.rs:200-212)") {
    val p4 = IdCodec.PidOffset + 4
    val p7 = IdCodec.PidOffset + 7
    assert(claims.filter(col("property_id") === p4).count() === 0)
    assert(claims.filter(col("property_id") === p7).count() === 25)
  }

  test("novalue/somevalue self-loop (value.rs:238-239)") {
    val edges = WikidataShredder.edge(claims)
    val loops = edges.filter(
      col("property_id").isin(IdCodec.PidOffset + 5, IdCodec.PidOffset + 6))
    assert(loops.count() === 50)
    assert(loops.filter(col("dst_id") =!= col("src_id")).count() === 0)
  }

  test("Fid/Sid wrap u32 (id.rs:73-84)") {
    val df = spark
      .createDataFrame(Seq(Tuple1("L7-F2"), Tuple1("L7-S3"), Tuple1("F7-F2")))
      .toDF("id")
      .select(IdCodec.idToU32(col("id")).as("u"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(705032713L, 1205032714L, 705032713L))
  }

  test("year >= 9999 becomes infinity sentinel (value.rs:271-284)") {
    val t = WikidataShredder.time(claims)
    val inf = t.filter(col("time_str") === "infinity")
    assert(inf.count() > 0)
    assert(inf.filter(col("time").isNotNull).count() === 0)
    // every non-infinity, non-BC row parses to a real timestamp
    assert(
      t.filter(
        col("time_str") =!= "infinity" && !col("time_str").startsWith("-") &&
          col("time").isNull)
        .count() === 0)
  }

  test("zero month/day normalizes to Jan 1; BC years keep canonical time_str") {
    val t = WikidataShredder.time(claims)
    // n%5=0 (not %7): +Y-00-00 -> Y-01-01, timestamp present
    val zeroed = t.filter(col("time_str").endsWith("-01-01 00:00:00"))
    assert(zeroed.count() === 4) // n = 5, 10, 15, 20
    assert(zeroed.filter(col("time").isNull).count() === 0)
    // n%3=0 (not %5/%7): negative year rendered, timestamp null
    val bc = t.filter(col("time_str").startsWith("-"))
    assert(bc.count() === 6) // n = 3, 6, 9, 12, 18, 24
    assert(bc.filter(col("time").isNotNull).count() === 0)
    assert(bc.filter(col("time_str") === "-0503-03-11 00:00:00").count() === 1)
  }

  test("time_micros: typed range filtering works on BC rows (value.rs:271-284)") {
    val t = WikidataShredder.time(claims)
    // BC rows: typed `time` is null (Spark timestamp floor) but
    // time_micros carries the exact proleptic epoch — range filters work
    val bcYear500s = t.filter(
      col("time_micros") >= -80000000000000000L && col("time_micros") < -62167219200000000L)
    assert(bcYear500s.count() === 6) // the -05xx rows (n = 3,6,9,12,18,24)
    assert(bcYear500s.filter(col("time").isNotNull).count() === 0)
    // spot-pin one value against DuckDB's epoch_us('-0503-03-11 00:00:00')
    val v = t
      .filter(col("time_str") === "-0503-03-11 00:00:00")
      .select("time_micros").collect().head.getLong(0)
    assert(v === -78034320000000000L) // = duckdb epoch_us('-0503-03-11 00:00:00')
    // infinity rows have no typed epoch either
    assert(t.filter(col("time_str") === "infinity" && col("time_micros").isNotNull).count() === 0)
    // AD rows: time_micros agrees with the typed timestamp it shadows
    val ad = t.filter(col("time").isNotNull)
    // session tz is UTC, so ntz -> timestamp is the same instant
    assert(
      ad.filter(unix_micros(col("time").cast("timestamp")) =!= col("time_micros"))
        .count() === 0)
  }

  test("shred cache honors spark.graft.shred.storageLevel (100 TB knob)") {
    val entities = graft.wikidata.SyntheticDump.entities(spark, sf)
    spark.conf.set("spark.graft.shred.storageLevel", "DISK_ONLY")
    try {
      val plan = WikidataShredder.shred(entities).edge.queryExecution.optimizedPlan.toString
      assert(plan.contains("StorageLevel(disk, 1 replicas)"), plan)
    } finally {
      spark.conf.unset("spark.graft.shred.storageLevel")
      GraftCache.clear()
    }
  }

  test("multilingual text: en entry -> string, no-en -> edge self-loop (value.rs:394-401)") {
    val s = WikidataShredder.string(claims)
    val p11 = IdCodec.PidOffset + 11
    val p12 = IdCodec.PidOffset + 12
    assert(s.filter(col("property_id") === p11).select("string").collect().map(_.getString(0)).toSeq === Seq("multi"))
    assert(s.filter(col("property_id") === p12).count() === 0)
    val e = WikidataShredder.edge(claims)
    val loop = e.filter(col("property_id") === p12).collect()
    assert(loop.length === 1)
    assert(loop.head.getLong(0) === loop.head.getLong(2)) // self-loop
  }

  test("dimensionless unit '1' -> null unit_id (value.rs:403-413)") {
    val q = WikidataShredder.quantity(claims)
    assert(q.filter(col("unit_id").isNull).count() > 0)
    assert(q.filter(col("unit_id").isNotNull && col("unit_id") =!= 4917).count() === 0)
  }

  test("monolingual text stored regardless of language (value.rs:393)") {
    val s = WikidataShredder.string(claims)
    assert(s.filter(col("string").startsWith("The ")).count() === 25)
  }

  test("path closure walks the P279 chain with min-depth dedup") {
    val rows = SparkEntry
      .queries("wd_query_path_closure")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // chain 24 -> 12 -> 6 -> 3: each hop at its exact depth
    assert(rows((34L, 22L)) === 1L)
    assert(rows((34L, 16L)) === 2L)
    assert(rows((34L, 13L)) === 3L)
    // deeper ancestors than the bound are absent (24 -> 1 is depth 4)
    assert(!rows.contains((34L, 11L)))
    // root self-loop dedups to min depth 1 despite depth-2/3 path copies
    assert(rows((10L, 10L)) === 1L)
  }
}
