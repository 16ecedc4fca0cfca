package graft.wikidata

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shredded star schema — the reference's 6 DuckDB tables
  * (/root/reference/wikidata-rs/src/value.rs:146-198), same column names
  * so downstream SQL ports verbatim. All edge-like tables share
  * (src_id, property_id, dst_id); annotation tables self-loop
  * (dst_id = src_id, value.rs:238-284).
  */
final case class Shredded(
    vertex: DataFrame,
    edge: DataFrame,
    string: DataFrame,
    quantity: DataFrame,
    coordinates: DataFrame,
    time: DataFrame) {
  def all: Seq[(String, DataFrame)] = Seq(
    "vertex" -> vertex,
    "edge" -> edge,
    "string" -> string,
    "quantity" -> quantity,
    "coordinates" -> coordinates,
    "time" -> time)
}

/** JSON-lines Wikidata dump -> typed star schema, as one declarative
  * Spark plan per table over a single parsed claims relation.
  *
  * Line handling mirrors the reference (main.rs:99-154): trim, skip
  * "["/"]"/empty, strip one trailing comma, tolerate malformed JSON
  * (PERMISSIVE + corrupt-record filter — the reference warns and skips,
  * main.rs:316-321). Deprecated-rank claims are dropped (main.rs:200-212).
  *
  * Scale: the dump is line-splittable text, so the scan parallelizes by
  * HDFS split; parsing is schema-on-read with the polymorphic datavalue
  * captured raw and sub-parsed per family (see WikidataSchema). The
  * claims relation is computed once and persisted when materializing all
  * 6 tables (one source scan, multi-sink) — on a cluster this is a
  * memory-and-disk cache sized by executor storage.
  */
object WikidataShredder {
  import WikidataSchema._

  /** Reference line sanitation, main.rs:104-119. */
  def cleanLines(raw: Dataset[String]): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    raw
      .toDF("line")
      .select(trim(col("line")).as("line"))
      .filter(col("line") =!= "" && col("line") =!= "[" && col("line") =!= "]")
      .select(
        when(
          col("line").endsWith(","),
          expr("substring(line, 1, length(line) - 1)"))
          .otherwise(col("line"))
          .as("line"))
      .as[String]
  }

  /** Read a dump from disk — Hadoop codecs make .gz/.bz2 transparent,
    * covering the reference's compressed-pipeline inputs
    * (main.rs:261-269). NOTE .gz is not splittable: one file = one read
    * task, so a production dump should be .bz2 (splittable) or
    * pre-chunked into many .gz parts. */
  def parseFile(spark: SparkSession, path: String): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    parse(spark, spark.read.textFile(path))
  }

  /** Parse cleaned lines; malformed lines and lines that are not entity
    * objects are skipped, not fatal (main.rs:124-151). */
  def parse(spark: SparkSession, lines: Dataset[String]): DataFrame =
    spark.read
      .schema(entity)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(cleanLines(lines))
      .filter(col("_corrupt_record").isNull && col("id").isNotNull)
      .drop("_corrupt_record")

  /** Streaming variant of [[parse]]: same sanitation and entity schema
    * over a STREAMING Dataset of raw dump lines — `from_json` replaces
    * the batch json reader (which cannot run incrementally). Malformed
    * lines parse to a null struct -> null id -> skipped, matching the
    * batch path's PERMISSIVE contract. Continuous dump ingestion is the
    * 100 TB posture: each micro-batch shreds incrementally instead of
    * re-reading the accumulated dump. */
  def parseStream(lines: Dataset[String]): DataFrame =
    cleanLines(lines)
      .toDF("line")
      .select(
        from_json(
          col("line"),
          entity,
          Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("e"))
      .select("e.*")
      // same drop rule as the batch path: a populated corrupt-record
      // column (partially-malformed entity) skips the WHOLE entity, not
      // just the broken field — else stream and batch shreds diverge
      .filter(col("_corrupt_record").isNull && col("id").isNotNull)
      .drop("_corrupt_record")

  /** vertex(id, label, description) — English-only (lib.rs:20,
    * main.rs:182-198). */
  def vertex(entities: DataFrame): DataFrame =
    entities.select(
      IdCodec.idToU32(col("id")).as("id"),
      col("labels")("en")("value").as("label"),
      col("descriptions")("en")("value").as("description"))

  /** One row per non-deprecated claim: (src_id, property_id, snaktype,
    * datatype, vtype, raw-JSON value). The routing base for every edge
    * table. */
  /** [[claims]] with the statement rank RETAINED — the input of
    * best-rank (truthy) selection, where a preferred statement
    * suppresses its property's normal ones. Deprecated statements are
    * still dropped here (main.rs:203 — they are never served). */
  def claimsWithRank(entities: DataFrame): DataFrame =
    entities
      .select(IdCodec.idToU32(col("id")).as("src_id"), explode(col("claims")))
      .withColumnRenamed("key", "prop")
      .select(col("src_id"), IdCodec.idToU32(col("prop")).as("property_id"), explode(col("value")).as("claim"))
      .filter(col("claim.rank") =!= "deprecated") // main.rs:203
      .select(
        col("src_id"),
        col("property_id"),
        col("claim.rank").as("rank"),
        col("claim.mainsnak.snaktype").as("snaktype"),
        col("claim.mainsnak.datatype").as("datatype"),
        col("claim.mainsnak.datavalue.type").as("vtype"),
        col("claim.mainsnak.datavalue.value").as("raw"))

  def claims(entities: DataFrame): DataFrame =
    claimsWithRank(entities).drop("rank")

  /** Entity-valued value-snak edges with the rank retained — the
    * best-rank selection input (no NoValue/Unknown self-loops here;
    * those carry no rank competition). */
  def entityEdgesWithRank(entities: DataFrame): DataFrame =
    claimsWithRank(entities)
      .filter(col("snaktype") === "value" && col("vtype") === "wikibase-entityid")
      .withColumn("ev", from_json(col("raw"), entityIdValue))
      .select(
        col("src_id"),
        col("property_id"),
        col("rank"),
        IdCodec.idToU32(col("ev.id")).as("dst_id"))

  private def keys = Seq(col("src_id"), col("property_id"))

  /** edge: entity-valued claims, NoValue/UnknownValue self-loops
    * (value.rs:237-239, 429-430), and multilingual texts with no
    * English entry (value.rs:394-401 — Table::None lands in edge as a
    * self-loop). */
  def edge(cl: DataFrame): DataFrame = {
    val ent = cl
      .filter(col("snaktype") === "value" && col("vtype") === "wikibase-entityid")
      .withColumn("ev", from_json(col("raw"), entityIdValue))
      .select(keys :+ IdCodec.idToU32(col("ev.id")).as("dst_id"): _*)
    val absent = cl
      .filter(col("snaktype").isin("novalue", "somevalue"))
      .select(keys :+ col("src_id").as("dst_id"): _*)
    val multiNoEn = cl
      .filter(col("snaktype") === "value" && col("vtype") === "multilingualtext")
      .withColumn("mv", from_json(col("raw"), multiValue))
      .filter(!exists(col("mv"), t => t.getField("language") === "en"))
      .select(keys :+ col("src_id").as("dst_id"): _*)
    ent.union(absent).union(multiNoEn)
  }

  /** string: the whole string family — string/CommonsMedia/ExternalID/
    * Url/MathExpr/GeoShape/MusicNotation/TabularData arrive as bare
    * strings; MonolingualText stores .text whatever the language
    * (value.rs:378-425, 393). Self-loop. */
  def string(cl: DataFrame): DataFrame = {
    val bare = cl
      .filter(col("snaktype") === "value" && col("vtype") === "string")
      .select(keys ++ Seq(col("src_id").as("dst_id"), col("raw").as("string")): _*)
    val mono = cl
      .filter(col("snaktype") === "value" && col("vtype") === "monolingualtext")
      .withColumn("mv", from_json(col("raw"), monoValue))
      .select(keys ++ Seq(col("src_id").as("dst_id"), col("mv.text").as("string")): _*)
    // multilingual text: the English entry's text (no-English claims go
    // to edge instead, value.rs:394-401)
    val multiEn = cl
      .filter(col("snaktype") === "value" && col("vtype") === "multilingualtext")
      .withColumn("mv", from_json(col("raw"), multiValue))
      .withColumn("en", filter(col("mv"), t => t.getField("language") === "en"))
      .filter(size(col("en")) > 0)
      .select(keys ++ Seq(
        col("src_id").as("dst_id"),
        element_at(col("en"), 1).getField("text").as("string")): _*)
    bare.union(mono).union(multiEn)
  }

  /** quantity: amount/bounds parsed from the dump's signed decimal
    * strings; unit URI -> Qid or null for "1" (value.rs:403-413). */
  def quantity(cl: DataFrame): DataFrame =
    cl.filter(col("snaktype") === "value" && col("vtype") === "quantity")
      .withColumn("qv", from_json(col("raw"), quantityValue))
      .select(keys ++ Seq(
        col("src_id").as("dst_id"),
        col("qv.amount").cast("double").as("amount"),
        col("qv.lowerBound").cast("double").as("lower_bound"),
        col("qv.upperBound").cast("double").as("upper_bound"),
        IdCodec.qidFromUri(col("qv.unit")).as("unit_id")): _*)

  /** coordinates: lat/lon/precision + globe Qid (value.rs:379-389). */
  def coordinates(cl: DataFrame): DataFrame =
    cl.filter(col("snaktype") === "value" && col("vtype") === "globecoordinate")
      .withColumn("cv", from_json(col("raw"), coordValue))
      .select(keys ++ Seq(
        col("src_id").as("dst_id"),
        col("cv.latitude").as("latitude"),
        col("cv.longitude").as("longitude"),
        col("cv.precision").as("precision"),
        IdCodec.qidFromUri(col("cv.globe")).as("globe_id")): _*)

  /** time: year >= 9999 becomes the reference's DuckDB `infinity`
    * sentinel (value.rs:271-284). Spark has no infinity timestamp, so
    * `time` is null for those rows and `time_str` carries the canonical
    * rendering ('infinity' or 'yyyy-MM-dd HH:mm:ss').
    *
    * Real dumps also carry zero month/day for coarse precisions
    * ("+2002-00-00T00:00:00Z") and negative (BC) years. Zero components
    * are normalized to January 1st before parsing — the same
    * normalization the reference's wikidata-crate -> chrono path
    * applies. BC years are outside Spark's timestamp range: `time` is
    * null and `time_str` carries the canonical signed rendering
    * ('-0500-03-11 00:00:00'), which DuckDB/chrono render losslessly.
    *
    * `time_micros` closes the typed-filtering gap for BC rows (the
    * reference keeps any chrono DateTime, value.rs:271-284): proleptic
    * Gregorian epoch microseconds (astronomical year numbering, the
    * ISO-8601/chrono/DuckDB convention), computed with the
    * days-from-civil algorithm in exact BIGINT arithmetic — both engines
    * produce bit-identical values. Defined for years in
    * [-290000, 9998] (the DuckDB timestamp envelope; 'infinity' and
    * deep-time years are null). */
  def time(cl: DataFrame): DataFrame = {
    val parsed = cl
      .filter(col("snaktype") === "value" && col("vtype") === "time")
      .withColumn("tv", from_json(col("raw"), timeValue))
      .withColumn(
        "tn",
        regexp_replace(regexp_replace(col("tv.time"), "-00-", "-01-"), "-00T", "-01T"))
      .withColumn("yr", regexp_extract(col("tn"), "^\\+?(-?\\d+)-", 1).cast("long"))
    def ts = to_timestamp_ntz(
      regexp_replace(col("tn"), "^\\+", ""),
      lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    val timePartRe = "^[+-]?\\d+-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})"
    def part(g: Int) = regexp_extract(col("tn"), timePartRe, g).cast("long")
    val micros =
      TimeEpoch.micros(col("yr"), part(1), part(2), part(3), part(4), part(5))
    parsed.select(keys ++ Seq(
      col("src_id").as("dst_id"),
      when(col("yr") >= 9999 || col("yr") < 0, lit(null).cast("timestamp_ntz"))
        .otherwise(ts)
        .as("time"),
      when(col("yr") >= 9999 || col("yr") < -290000, lit(null).cast("long"))
        .otherwise(micros)
        .as("time_micros"),
      when(col("yr") >= 9999, lit("infinity"))
        .when(
          col("yr") < 0,
          regexp_replace(regexp_replace(col("tn"), "T", " "), "Z$", ""))
        .otherwise(date_format(ts, "yyyy-MM-dd HH:mm:ss"))
        .as("time_str"),
      col("tv.precision").as("precision")): _*)
  }

  /** Full shred — single source scan; the claims relation is persisted
    * so the 6 sinks share one parse (the reference's one-pass appender
    * loop, main.rs:311-326).
    *
    * Storage level comes from `spark.graft.shred.storageLevel` (default
    * MEMORY_AND_DISK). At 100 TB the parsed claims relation dwarfs
    * executor storage memory — set DISK_ONLY there so the cache never
    * competes with shuffle/execution memory, or NONE to recompute per
    * sink. Registered with GraftCache for harness cleanup. */
  def shred(entities: DataFrame): Shredded = {
    val levelName = entities.sparkSession.conf
      .get("spark.graft.shred.storageLevel", "MEMORY_AND_DISK")
    val cl =
      if (levelName == "NONE") claims(entities)
      else graft.GraftCache.register(claims(entities).persist(StorageLevel.fromString(levelName)))
    Shredded(vertex(entities), edge(cl), string(cl), quantity(cl), coordinates(cl), time(cl))
  }
}
