package graft

import graft.expressions.GraftExtensions
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  import TestSpark._

  test("native DotQ matches the interpreted zip_with/aggregate formulation") {
    val e = Tables(spark, sf).embeddings
      .withColumn("qv", VectorFunctions.quantize(col("embedding")))
    val both = e
      .select(
        VectorFunctions.dotQ(col("qv"), col("qv")).as("native"),
        VectorFunctions.dotQInterpreted(col("qv"), col("qv")).as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() === 0)
    // whole-stage codegen must cover the native expression when it is
    // not co-located with interpreted higher-order functions
    val nativeOnly = e.select(VectorFunctions.dotQ(col("qv"), col("qv")).as("native"))
    // the native expression must be evaluated INSIDE a WholeStageCodegen
    // stage (structural form of the old "*(n) Project [graft_dotq" check)
    assert(
      PlanCheck.codegenCovers(nativeOnly, _.isInstanceOf[graft.expressions.DotQ]),
      PlanCheck.render(nativeOnly))
  }

  test("native WinnowFingerprint matches the interpreted HOF formulation") {
    import graft.functions.TextFunctions._
    val d = Tables(spark, sf).documents
      .withColumn("sh", shingles(ws(col("text")), 3))
      .filter(size(col("sh")) >= 4)
      .select(col("doc_id"), posexplode(col("sh")))
      .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("h"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("h"))).as("ph"))
    val interp = d
      .withColumn(
        "hs",
        transform(array_sort(col("ph")), x => x.getField("h")))
      .withColumn(
        "mins",
        transform(
          sequence(lit(1), size(col("hs")) - 3),
          i => array_min(slice(col("hs"), i, lit(4)))))
      .select(col("doc_id"), array_sort(array_distinct(col("mins"))).as("fp"))
    val native = d.select(col("doc_id"), winnowFp(col("ph"), 4).as("fp"))
    val joined = native
      .withColumnRenamed("fp", "fp_n")
      .join(interp, "doc_id")
    assert(joined.filter(col("fp_n") =!= col("fp")).count() === 0)
    assert(native.count() > 0)
    // After an aggregate the optimizer folds winnowFp into the
    // ObjectHashAggregate result projection (one eval per group). In a
    // plain projection it must sit inside the WholeStageCodegen span:
    val proj = spark
      .range(100)
      .select(
        array(
          struct(lit(1).as("pos"), md5(col("id").cast("string").cast("binary")).as("h")),
          struct(lit(0).as("pos"), md5((col("id") + 1).cast("string").cast("binary")).as("h")))
          .as("ph"))
      .select(winnowFp(col("ph"), 2).as("fp"))
    assert(
      PlanCheck.codegenCovers(proj, _.isInstanceOf[graft.expressions.WinnowFingerprint]),
      PlanCheck.render(proj))
  }

  test("native ShingleK matches the interpreted formulation") {
    import graft.functions.TextFunctions._
    val d = Tables(spark, sf).documents
    val both = d.select(
      shingles(ws(col("text")), 3).as("nat"),
      shinglesInterpreted(ws(col("text")), 3).as("interp"),
      shingleSet(col("text"), 3).as("nat_set"),
      array_distinct(shinglesInterpreted(ws(col("text")), 3)).as("interp_set"))
    assert(both.filter(col("nat") =!= col("interp")).count() === 0)
    assert(both.filter(col("nat_set") =!= col("interp_set")).count() === 0)
    // short-doc edge: fewer than k words -> empty array, not null
    import spark.implicits._
    val short = Seq("one two", "a").toDF("text").select(shingles(ws(col("text")), 3).as("s"))
    assert(short.collect().forall(_.getSeq[String](0).isEmpty))
    // codegen-resident in a plain projection
    val proj3 = d.select(shingles(ws(col("text")), 3).as("s"))
    assert(
      PlanCheck.codegenCovers(proj3, _.isInstanceOf[graft.expressions.ShingleK]),
      PlanCheck.render(proj3))
  }

  test("native CdcBoundaries matches the interpreted md5 formulation") {
    import graft.functions.TextFunctions._
    val d = Tables(spark, sf).documents
    val interp = expr(
      """CASE WHEN length(text) - 7 >= 2 THEN
        |  filter(transform(sequence(2, length(text) - 7),
        |    i -> CASE WHEN pmod(cast(conv(substring(md5(cast(substring(text, i, 8) as binary)), 1, 8), 16, 10) as bigint), 64) = 0 THEN i END),
        |    x -> x is not null)
        |ELSE cast(array() as array<int>) END""".stripMargin)
    val both = d.select(cdcBoundaries(col("text")).as("nat"), interp.as("it"))
    assert(both.filter(col("nat") =!= col("it")).count() === 0)
    // short-text edge: no position can host a boundary -> empty, not null
    import spark.implicits._
    val short = Seq("tiny", "exactly8!", "").toDF("text")
      .select(cdcBoundaries(col("text")).as("b"))
    assert(short.collect().forall(_.getSeq[Int](0).isEmpty))
    // codegen-resident in a plain projection + SQL surface registered
    val proj4 = d.select(cdcBoundaries(col("text")).as("b"))
    assert(
      PlanCheck.codegenCovers(proj4, _.isInstanceOf[graft.expressions.CdcBoundaries]),
      PlanCheck.render(proj4))
    GraftExtensions.register(spark)
    Tables(spark, sf).views("documents")
    assert(
      spark.sql("SELECT graft_cdc_boundaries(text) AS b FROM documents WHERE doc_id = 1").count() === 1)
  }

  test("native FrameEnergy matches the interpreted higher-order fold") {
    val d = Tables(spark, sf).documents
    def native = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.FrameEnergy(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("text")),
        frames = 8,
        center = 64))
    // the HOF formulation mm_audio_energy shipped with before the
    // kernel: per-window aggregate over 1-char slices
    val interp = expr(
      """transform(
        |  filter(sequence(0, 7), k -> k * greatest(length(text) div 8, 1) < length(text)),
        |  k -> aggregate(
        |    sequence(k * greatest(length(text) div 8, 1) + 1,
        |             k * greatest(length(text) div 8, 1) + greatest(length(text) div 8, 1)),
        |    0L, (acc, i) ->
        |      acc + CAST(ascii(substring(text, CAST(i AS INT), 1)) - 64 AS BIGINT)
        |          * CAST(ascii(substring(text, CAST(i AS INT), 1)) - 64 AS BIGINT)))""".stripMargin)
    val both = d.select(native.as("nat"), interp.as("it"))
    assert(both.filter(col("nat") =!= col("it")).count() === 0)
    // short-payload edges: fewer samples than frames -> one 1-sample
    // window per sample; empty payload -> empty array, not null
    import spark.implicits._
    val short = Seq("abc", "", "x").toDF("text").select(native.as("e"))
    val es = short.collect().map(_.getSeq[Long](0))
    assert(es(0).length === 3 && es(1).isEmpty && es(2).length === 1)
    assert(es(0) === "abc".map { c => val v = c.toLong - 64; v * v })
    // codegen-resident in a plain projection + SQL surface registered
    val proj5 = d.select(native.as("e"))
    assert(
      PlanCheck.codegenCovers(proj5, _.isInstanceOf[graft.expressions.FrameEnergy]),
      PlanCheck.render(proj5))
    GraftExtensions.register(spark)
    Tables(spark, sf).views("documents")
    assert(
      spark.sql("SELECT graft_frame_energy(text) AS e FROM documents WHERE doc_id = 1").count() === 1)
  }

  test("WinnowFingerprint short arrays and empty results") {
    import graft.functions.TextFunctions._
    import spark.implicits._
    // 3 hashes with w=4 -> no full window -> empty fingerprint
    val df = Seq((1L, Seq((1, "b"), (0, "a"), (2, "c"))))
      .toDF("id", "ph")
      .select(col("id"), winnowFp(col("ph"), 4).as("fp"))
    assert(df.collect().head.getSeq[String](1) === Seq.empty)
    // exactly one window -> its min, position order applied
    val one = Seq((1L, Seq((3, "a"), (0, "d"), (1, "c"), (2, "b"))))
      .toDF("id", "ph")
      .select(winnowFp(col("ph"), 4).as("fp"))
    assert(one.collect().head.getSeq[String](0) === Seq("a"))
  }

  test("SQL surface: graft_dotq / graft_id_to_u32 registered functions") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("""SELECT graft_dotq(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
             |graft_id_to_u32('Q42') AS q, graft_id_to_u32('P31') AS p,
             |graft_id_to_u32('L7-F2') AS f, graft_qid_from_uri('http://www.wikidata.org/entity/Q4917') AS u,
             |graft_qid_from_uri('1') AS dimless""".stripMargin)
      .collect()
      .head
    assert(r.getLong(0) === 32L)
    assert(r.getLong(1) === 42L)
    assert(r.getLong(2) === 1000000031L)
    assert(r.getLong(3) === 705032713L)
    assert(r.getLong(4) === 4917L)
    assert(r.isNullAt(5))
  }

  test("DotQ nulls the result on null elements (interpreted parity)") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("""SELECT graft_dotq(array(1L, NULL, 3L), array(4L, 5L, 6L)) AS withnull,
             |graft_dotq(array(1L, 2L), array(4L, NULL)) AS rightnull,
             |graft_dotq(array(1L, 2L), array(4L, 5L)) AS clean""".stripMargin)
      .collect()
      .head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.getLong(2) === 14L)
    // interpreted mirror agrees
    import spark.implicits._
    val interp = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.dotQInterpreted(col("a"), col("b")).as("d"))
      .collect()
      .head
    assert(interp.isNullAt(0))
  }

  test("DotQ rejects wrong input types") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dotq(array('a'), array(1L))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dotq") || e.getMessage.contains("DATATYPE"))
  }
}
