package graft.wikidata

import graft.{Fan, Tables}
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Wikidata dump built from the driver's testdata tables —
  * the oracle can therefore reconstruct every shredded table relationally
  * from the same parquet (see WikidataCatalog for the SQL).
  *
  * Content map (n = n_nationkey, r = n_regionkey):
  *   - item Q(10+n) per nation: label n_name; description 'nation '||name
  *     except n%5=0 (absent); claims:
  *       P31  entity -> Q(100+r)                      rank normal
  *       P7   entity -> [Q(200+n) preferred, Q999 deprecated]  (array)
  *       P4   entity -> Q999                          rank deprecated (dropped)
  *       P5   novalue, P6 somevalue                   (self-loop edges)
  *       P3   string 'S-'||name; P2 external-id 'EXT-'||n;
  *       P856 url 'https://example.org/'||n;
  *       P1448 monolingualtext {'The '||name, lang de} (text stored, lang ignored)
  *       P1082 quantity amount n*1000+500.25; n%3=0 -> no bounds, unit "1";
  *             else bounds ±10, unit Q4917
  *       P625 coordinate (n*2.5-25, r*10-20, 0.01, globe Q2)
  *       P571 time: n%7=0 -> year 10000 (infinity, precision 9);
  *             n%5=0 -> zero month/day (+Y-00-00, precision 9);
  *             n%3=0 -> BC year (-0(500+n), precision 11);
  *             else (1950+n)-03-11, precision 11
  *   - property P(40+r) per region: label r_name, no descriptions,
  *     claim P31 -> Q(300+r)
  *   - one lexeme L7: claims P8 -> form L7-F2, P9 -> sense L7-S3,
  *     P11 multilingual text with en -> string, P12 without en -> edge
  *     self-loop
  *   - noise: "[", "]", blanks, malformed JSON; nation lines carry a
  *     trailing comma (all must be tolerated, main.rs:104-119).
  */
object SyntheticDump {

  private def j(c: Column): Column = concat(lit("\""), c, lit("\""))
  private def str(c: Column): Column = c.cast("string")

  private def claim(mainsnak: Column, rank: String): Column =
    concat(lit("{\"mainsnak\":"), mainsnak, lit(s""","type":"statement","rank":"$rank"}"""))

  private def valueSnak(prop: String, datatype: String, vtype: String, v: Column): Column =
    concat(
      lit(s"""{"snaktype":"value","property":"$prop","datatype":"$datatype","datavalue":{"type":"$vtype","value":"""),
      v,
      lit("}}"))

  private def absentSnak(prop: String, snaktype: String): Column =
    lit(s"""{"snaktype":"$snaktype","property":"$prop","datatype":"wikibase-item"}""")

  private def itemValue(q: Column): Column =
    concat(lit("""{"entity-type":"item","id":"Q"""), str(q), lit("\"}"))

  def lines(spark: SparkSession, dir: String): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    val t = Tables(spark, dir)

    val n = col("n_nationkey").cast("long")
    val r = col("n_regionkey").cast("long")
    val name = col("n_name")

    def arr(cs: Column*): Column =
      concat(lit("["), concat_ws(",", cs: _*), lit("]"))

    val claims = concat_ws(
      ",",
      concat(lit("\"P31\":"), arr(claim(valueSnak("P31", "wikibase-item", "wikibase-entityid", itemValue(r + 100)), "normal"))),
      concat(
        lit("\"P7\":"),
        arr(
          claim(valueSnak("P7", "wikibase-item", "wikibase-entityid", itemValue(n + 200)), "preferred"),
          claim(valueSnak("P7", "wikibase-item", "wikibase-entityid", itemValue(lit(999))), "deprecated"))),
      concat(lit("\"P4\":"), arr(claim(valueSnak("P4", "wikibase-item", "wikibase-entityid", itemValue(lit(999))), "deprecated"))),
      concat(lit("\"P5\":"), arr(claim(absentSnak("P5", "novalue"), "normal"))),
      concat(lit("\"P6\":"), arr(claim(absentSnak("P6", "somevalue"), "normal"))),
      concat(lit("\"P3\":"), arr(claim(valueSnak("P3", "string", "string", j(concat(lit("S-"), name))), "normal"))),
      concat(lit("\"P2\":"), arr(claim(valueSnak("P2", "external-id", "string", j(concat(lit("EXT-"), str(n)))), "normal"))),
      concat(lit("\"P856\":"), arr(claim(valueSnak("P856", "url", "string", j(concat(lit("https://example.org/"), str(n)))), "normal"))),
      concat(
        lit("\"P1448\":"),
        arr(claim(
          valueSnak("P1448", "monolingualtext", "monolingualtext",
            concat(lit("""{"text":"The """), name, lit("""","language":"de"}"""))),
          "normal"))),
      concat(
        lit("\"P1082\":"),
        arr(claim(
          valueSnak("P1082", "quantity", "quantity",
            when(n % 3 === 0,
              concat(lit("""{"amount":"+"""), str(n * 1000 + 500), lit(""".25","unit":"1"}""")))
              .otherwise(concat(
                lit("""{"amount":"+"""), str(n * 1000 + 500),
                lit(""".25","lowerBound":"+"""), str(n * 1000 + 490),
                lit(""".25","upperBound":"+"""), str(n * 1000 + 510),
                lit(""".25","unit":"http://www.wikidata.org/entity/Q4917"}""")))),
          "normal"))),
      concat(
        lit("\"P625\":"),
        arr(claim(
          valueSnak("P625", "globe-coordinate", "globecoordinate",
            concat(
              lit("""{"latitude":"""), str(n.cast("double") * 2.5 - 25.0),
              lit(""","longitude":"""), str(r.cast("double") * 10.0 - 20.0),
              lit(""","precision":0.01,"globe":"http://www.wikidata.org/entity/Q2"}"""))),
          "normal"))),
      concat(
        lit("\"P571\":"),
        arr(claim(
          valueSnak("P571", "time", "time",
            when(n % 7 === 0, lit("""{"time":"+10000-01-01T00:00:00Z","precision":9}"""))
              // zero month/day, the real-dump form for precision<=10
              .when(n % 5 === 0, concat(
                lit("""{"time":"+"""), str(n + 1950),
                lit("""-00-00T00:00:00Z","precision":9}""")))
              // BC year
              .when(n % 3 === 0, concat(
                lit("""{"time":"-0"""), str(n + 500),
                lit("""-03-11T00:00:00Z","precision":11}""")))
              .otherwise(concat(
                lit("""{"time":"+"""), str(n + 1950),
                lit("""-03-11T00:00:00Z","precision":11}""")))),
          "normal")))
    )

    val nationLines = t.nation.select(
      concat(
        lit("""{"type":"item","id":"Q"""), str(n + 10), lit("\""),
        lit(""","labels":{"en":{"language":"en","value":""""), name, lit("\"}}"),
        when(n % 5 === 0, lit(""))
          .otherwise(concat(lit(""","descriptions":{"en":{"language":"en","value":"nation """), name, lit("\"}}"))),
        lit(""","claims":{"""), claims, lit("}}"),
        lit(",") // trailing comma — must be stripped by the cleaner
      ).as("line"))

    val rr = col("r_regionkey").cast("long")
    val regionLines = t.region.select(
      concat(
        lit("""{"type":"property","id":"P"""), str(rr + 40), lit("\""),
        lit(""","labels":{"en":{"language":"en","value":""""), col("r_name"), lit("\"}}"),
        lit(""","claims":{"P31":["""),
        claim(valueSnak("P31", "wikibase-item", "wikibase-entityid", itemValue(rr + 300)), "normal"),
        lit("]}}")).as("line"))

    val fixed = spark.createDataset(Seq(
      "[",
      "  ", // blank line
      // P11: multilingual text WITH an English entry -> string row;
      // P12: multilingual text with NO English -> edge self-loop
      // (value.rs:394-401)
      """{"type":"lexeme","id":"L7","labels":{"en":{"language":"en","value":"lex"}},"descriptions":{"en":{"language":"en","value":"a lexeme"}},"claims":{"P8":[{"mainsnak":{"snaktype":"value","property":"P8","datatype":"wikibase-form","datavalue":{"type":"wikibase-entityid","value":{"entity-type":"form","id":"L7-F2"}}},"type":"statement","rank":"normal"}],"P9":[{"mainsnak":{"snaktype":"value","property":"P9","datatype":"wikibase-sense","datavalue":{"type":"wikibase-entityid","value":{"entity-type":"sense","id":"L7-S3"}}},"type":"statement","rank":"normal"}],"P11":[{"mainsnak":{"snaktype":"value","property":"P11","datatype":"multilingual-text","datavalue":{"type":"multilingualtext","value":[{"language":"de","text":"mehr"},{"language":"en","text":"multi"}]}},"type":"statement","rank":"normal"}],"P12":[{"mainsnak":{"snaktype":"value","property":"P12","datatype":"multilingual-text","datavalue":{"type":"multilingualtext","value":[{"language":"de","text":"nur-de"}]}},"type":"statement","rank":"normal"}]}}""",
      """{"id": broken json line that must be skipped""",
      // claims-less entity: vertex row only (the wikidata model allows
      // entities with no statements)
      """{"type":"item","id":"Q5000000","labels":{"en":{"language":"en","value":"solo"}}}""",
      "]"
    ))

    nationLines.as[String].union(regionLines.as[String]).union(fixed)
  }

  /** Parse the synthetic dump for `dir` — the base relation every wd_*
    * catalog query shreds from. */
  def entities(spark: SparkSession, dir: String) =
    WikidataShredder.parse(spark, lines(spark, dir))

  /** Scale-proportional dump: one item per `orders` row (~150k entities
    * at sf0.1) — the ingestion-throughput workload. nation/region dumps
    * are fixed-size (25+5+1 entities) and only prove semantics; this one
    * scales with the sf like a real dump slice.
    *
    * Q(3e6+o_orderkey): label 'order N';
    *   P20 entity -> Q(4e6+o_custkey); P21 quantity o_totalprice (2-dec
    *   exact); P22 time o_orderdate; P23 string o_orderpriority.
    */
  def ordersLines(spark: SparkSession, dir: String): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    val t = Tables(spark, dir)
    val ok = col("o_orderkey").cast("long")
    val claims = concat_ws(
      ",",
      concat(lit("\"P20\":"),
        lit("["),
        claim(valueSnak("P20", "wikibase-item", "wikibase-entityid",
          itemValue(col("o_custkey").cast("long") + 4000000L)), "normal"),
        lit("]")),
      concat(lit("\"P21\":"),
        lit("["),
        claim(valueSnak("P21", "quantity", "quantity",
          concat(
            lit("""{"amount":"+"""),
            col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string"),
            lit("""","unit":"1"}"""))), "normal"),
        lit("]")),
      concat(lit("\"P22\":"),
        lit("["),
        claim(valueSnak("P22", "time", "time",
          concat(
            lit("""{"time":"+"""),
            date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"),
            lit("""Z","precision":11}"""))), "normal"),
        lit("]")),
      concat(lit("\"P23\":"),
        lit("["),
        claim(valueSnak("P23", "string", "string", j(col("o_orderpriority"))), "normal"),
        lit("]"))
    )
    Fan
      .out(t.orders)
      .select(
        concat(
          lit("""{"type":"item","id":"Q"""), str(ok + 3000000L), lit("\""),
          lit(""","labels":{"en":{"language":"en","value":"order """), str(ok), lit("\"}}"),
          lit(""","claims":{"""), claims, lit("}}")).as("line"))
      .as[String]
  }

  def ordersEntities(spark: SparkSession, dir: String) =
    WikidataShredder.parse(spark, ordersLines(spark, dir))

  /** Hierarchy dump for path queries: one item per nation row whose only
    * claim is P279 (subclass-of) pointing at the binary-tree parent
    * Q(10 + n/2) — so the shredded edge table forms a 25-node tree with
    * chains up to 5 deep (24→12→6→3→1→0) and a root self-loop at Q10.
    * The P279* ancestor traversal over exactly this edge shape is THE
    * canonical query the reference's consumers run against the DuckDB
    * file (class-hierarchy walks, main README use case).
    */
  def chainLines(spark: SparkSession, dir: String): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    val t = Tables(spark, dir)
    val n = col("n_nationkey").cast("long")
    t.nation
      .select(
        concat(
          lit("""{"type":"item","id":"Q"""), str(n + 10), lit("\""),
          lit(""","labels":{"en":{"language":"en","value":""""), col("n_name"), lit("\"}}"),
          lit(""","claims":{"P279":["""),
          claim(
            // `div`, not `/`: Spark's `/` on longs is a DOUBLE divide and
            // would render the parent Qid as "Q15.0"
            valueSnak("P279", "wikibase-item", "wikibase-entityid",
              itemValue(expr("CAST(n_nationkey AS BIGINT) div 2") + 10)),
            "normal"),
          lit("]}}")).as("line"))
      .as[String]
  }

  def chainEntities(spark: SparkSession, dir: String) =
    WikidataShredder.parse(spark, chainLines(spark, dir))
}
