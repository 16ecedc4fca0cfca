package graft

import org.apache.spark.sql.SparkSession

/** CLI analog of the reference's entry point (main.rs:246-268): shred a
  * JSON-lines Wikidata dump into the 6-table artifact.
  *
  *   graft.Main --json <path|-> --database <outDir>
  *
  *   - refuses an existing --database path (main.rs:252-256)
  *   - `--json -` reads stdin, spooled to a temp file before the
  *     distributed read (a single stdin pipe is inherently one
  *     sequential reader — the same bottleneck the reference's
  *     BufReader has; production deployments point --json at dump
  *     files/dirs, which split)
  *   - .gz/.bz2 inputs are transparent via Hadoop codecs, covering the
  *     reference's compressed pipelines (main.rs:261-269)
  *   - the output is the ShreddedLayout directory tree: partitioned +
  *     sorted parquet = the reference's tables + indices
  *     (value.rs:306-350) as pure layout
  */
object Main {

  def run(spark: SparkSession, json: String, database: String): Unit = {
    require(
      !new java.io.File(database).exists(),
      "Cannot open an already created database")
    val path =
      if (json == "-") {
        val tmp = java.nio.file.Files.createTempFile("graft_stdin_", ".jsonl")
        java.nio.file.Files
          .copy(System.in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        tmp.toString
      } else json
    val entities = wikidata.WikidataShredder.parseFile(spark, path)
    wikidata.ShreddedLayout.write(wikidata.WikidataShredder.shred(entities), database)
  }

  def main(args: Array[String]): Unit = {
    val m = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    val json = m.getOrElse("--json", sys.error("--json <path|-> required"))
    val db = m.getOrElse("--database", sys.error("--database <dir> required"))
    val spark =
      GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, json, db)
    finally spark.stop()
  }
}
