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
    val plan = nativeOnly.queryExecution.executedPlan.toString
    // "*(n) Project [graft_dotq..." marks the WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("graft_dotq") && l.trim.startsWith("*(")), plan)
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

  test("DotQ rejects wrong input types") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dotq(array('a'), array(1L))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dotq") || e.getMessage.contains("DATATYPE"))
  }
}
