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
  *   - a `--database` path ending in `.duckdb` instead produces the
  *     reference's LITERAL artifact: tables written through the JDBC
  *     sink into a DuckDB file, then `src_id`/`dst_id` indexed exactly
  *     as the reference does (value.rs:332-348). Requires the DuckDB
  *     JDBC driver on the classpath; fails with a clear message if
  *     absent.
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
    val shredded = wikidata.WikidataShredder.shred(entities)
    if (database.endsWith(".duckdb")) writeDuckDb(shredded, database)
    else wikidata.ShreddedLayout.write(shredded, database)
  }

  /** The reference's end artifact: an indexed `.duckdb` database. */
  private def writeDuckDb(shredded: wikidata.Shredded, database: String): Unit = {
    try Class.forName("org.duckdb.DuckDBDriver")
    catch {
      case _: ClassNotFoundException =>
        sys.error(
          "DuckDB JDBC driver not on the classpath — point --database at a " +
            "directory for the parquet layout, or add the driver jar")
    }
    val url = s"jdbc:duckdb:$database"
    shredded.all.foreach { case (name, df) =>
      sources.GraftJdbcSink.write(df, url, name)
    }
    // the reference indexes exactly src_id and dst_id (value.rs:332-348)
    val conn = java.sql.DriverManager.getConnection(url)
    try shredded.all.foreach { case (name, df) =>
      df.schema.fieldNames.filter(c => c == "src_id" || c == "dst_id").foreach { c =>
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE INDEX IF NOT EXISTS ${name}_${c}_index ON $name ($c)")
        finally st.close()
      }
    } finally conn.close()
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
