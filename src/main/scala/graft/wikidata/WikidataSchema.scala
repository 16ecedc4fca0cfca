package graft.wikidata

import org.apache.spark.sql.types._

/** Explicit schema for Wikidata JSON dump lines — no inference pass (at
  * 100 TB schema inference would double the scan).
  *
  * `datavalue.value` is polymorphic in the dump (bare string for
  * string-family values, object otherwise), which a static struct cannot
  * express; declaring it StringType makes Spark's Jackson parser capture
  * the raw JSON token text, and per-type sub-schemas are applied lazily
  * with from_json only on the rows routed to each table. This keeps the
  * scan single-pass and the heavy parse per-family instead of per-row.
  */
object WikidataSchema {

  val langValue: StructType = new StructType()
    .add("language", StringType)
    .add("value", StringType)

  val datavalue: StructType = new StructType()
    .add("type", StringType)
    .add("value", StringType) // raw JSON text (object) or the bare string

  val mainsnak: StructType = new StructType()
    .add("snaktype", StringType) // value | novalue | somevalue
    .add("property", StringType)
    .add("datatype", StringType)
    .add("datavalue", datavalue)

  val claim: StructType = new StructType()
    .add("mainsnak", mainsnak)
    .add("type", StringType)
    .add("rank", StringType) // normal | preferred | deprecated

  val entity: StructType = new StructType()
    .add("type", StringType)
    .add("id", StringType)
    .add("labels", MapType(StringType, langValue))
    .add("descriptions", MapType(StringType, langValue))
    .add("claims", MapType(StringType, ArrayType(claim)))
    .add("_corrupt_record", StringType)

  // --- per-datavalue-type sub-schemas (second-stage from_json) ---------

  val entityIdValue: StructType = new StructType()
    .add("entity-type", StringType)
    .add("numeric-id", LongType)
    .add("id", StringType)

  val monoValue: StructType = new StructType()
    .add("text", StringType)
    .add("language", StringType)

  /** Multilingual text: array of (language, text) pairs. The English
    * entry becomes a string row; with no English entry the claim lands
    * in edge as a self-loop (value.rs:394-401). */
  val multiValue: ArrayType = ArrayType(monoValue)

  val quantityValue: StructType = new StructType()
    .add("amount", StringType)
    .add("lowerBound", StringType)
    .add("upperBound", StringType)
    .add("unit", StringType)

  val timeValue: StructType = new StructType()
    .add("time", StringType)
    .add("precision", IntegerType)

  val coordValue: StructType = new StructType()
    .add("latitude", DoubleType)
    .add("longitude", DoubleType)
    .add("precision", DoubleType)
    .add("globe", StringType)
}
