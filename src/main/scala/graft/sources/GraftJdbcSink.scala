package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Batched JDBC sink — the Spark analog of the reference's DuckDB
  * appender + 1000-inserts-per-transaction loop (main.rs:300-326,
  * lib.rs:21). Each partition opens a connection and writes
  * `batchSize`-row batches; table DDL is generated with DuckDB-shaped
  * types (value.rs:146-198) so the output schema matches the
  * reference's database structure.
  *
  * Parquet is the scale-path sink; JDBC is for feeding the shredded
  * tables into an external warehouse. Tested against embedded Derby
  * (the only JDBC engine in the container) in SinksSpec.
  */
object GraftJdbcSink {

  /** DuckDB-flavoured column types (UINTEGER has no JDBC analog: ids are
    * BIGINT, matching the engine's u32-in-i64 representation). */
  def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case StringType => "VARCHAR(4096)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  def ddlFor(table: String, schema: StructType): String =
    schema.fields
      .map(f => s"${f.name} ${sqlType(f.dataType)}${if (f.nullable) "" else " NOT NULL"}")
      .mkString(s"CREATE TABLE $table (", ", ", ")")

  /** Create the table (if absent) and append the frame in batches.
    * Executors write partitions concurrently — the JDBC-side unit of
    * parallelism, like one appender per thread.
    *
    * Existence is checked case-insensitively (engines fold unquoted
    * identifiers differently: Derby/DB2 upper-case, PostgreSQL/DuckDB
    * lower-case), and the CREATE tolerates an already-exists race from
    * a concurrent writer — the check-then-create pair is advisory, the
    * append is the operation that must succeed. */
  def write(df: DataFrame, url: String, table: String, batchSize: Int = 1000): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      def exists(name: String): Boolean = {
        val md = conn.getMetaData
        // getTables treats the name as a LIKE pattern: escape the
        // metacharacters so nation_x can't match nationYx
        // (DuckDB's driver returns null here — escaping is then
        // impossible, so the exact-name re-check below carries the load)
        val esc = Option(md.getSearchStringEscape).filter(_.nonEmpty)
        val pat = esc.fold(name)(e =>
          name.replace(e, e + e).replace("_", e + "_").replace("%", e + "%"))
        val rs = md.getTables(null, null, pat, null)
        // getTables treats the name as a LIKE pattern: even escaped,
        // require an EXACT name match so `a_b` never matches `axb` and
        // silently skips the reference-shaped DDL
        try {
          var hit = false
          while (!hit && rs.next()) hit = rs.getString("TABLE_NAME") == name
          hit
        } finally rs.close()
      }
      def existsAnyCase: Boolean =
        exists(table.toUpperCase) || exists(table.toLowerCase) || exists(table)
      if (!existsAnyCase) {
        val st = conn.createStatement()
        try st.executeUpdate(ddlFor(table, df.schema))
        catch {
          // Don't trust message text ('... does not exist' would also
          // match a substring check): re-probe the catalog — if the
          // table is there now we merely lost a create race; anything
          // else is a genuine failure and propagates.
          case e: java.sql.SQLException if existsAnyCase => ()
        } finally st.close()
      }
    } finally conn.close()
    df.write
      .mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, new java.util.Properties())
  }
}
