package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch diagnostics main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    // Does StringType capture a raw JSON object / keep a bare string?
    val lines = spark.createDataset(
      Seq(
        """{"dv":{"type":"string","value":"hello"}}""",
        """{"dv":{"type":"quantity","value":{"amount":"+15.25","unit":"1"}}}""",
        """{"dv":{"type":"entity","value":{"entity-type":"item","id":"Q42"}}}"""
      ))
    val schema = new StructType().add(
      "dv",
      new StructType().add("type", StringType).add("value", StringType))
    val df = spark.read.schema(schema).json(lines)
    df.show(false)
    val q = new StructType().add("amount", StringType).add("unit", StringType)
    df.select(from_json(col("dv.value"), q).as("qv")).show(false)
    spark.stop()
  }
}
