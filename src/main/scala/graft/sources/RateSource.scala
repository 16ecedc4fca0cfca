package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** A Kafka-SHAPED synthetic streaming source — the non-file arm of the
  * streaming surface: deterministic records fanned over `partitions`
  * logical partitions with per-partition monotone sequence numbers
  * (the consumer-visible shape of a partitioned log), admission-capped
  * by `rowsPerTrigger` exactly like the snapshot source's
  * maxVersionsPerTrigger (and Kafka's maxOffsetsPerTrigger): a long
  * backlog drains as bounded micro-batches, and the planned position
  * persists through [[HighWaterMark]] so a restarted source never
  * reports an offset below the committed one. The sandbox has no
  * broker; what a broker would provide — external, replayable,
  * offset-addressed records — is synthesized deterministically:
  * record g ∈ [0, totalRows) lands in partition g % P with sequence
  * g / P and value (g · 2654435761) mod 1000000007, so any slice is
  * reproducible from its offset range alone (Kafka's replayability
  * contract) and a relational oracle recomputes the whole stream.
  *
  * Offsets are the GLOBAL emitted count; each micro-batch materializes
  * its (start, end] slice under a deterministic range-keyed staging
  * path (a WAL replay overwrites identical content — the same replay
  * idempotence move as the CDC source) and hands Spark a streaming
  * parquet relation.
  *
  * Options: `totalRows` (required — the backlog), `rowsPerTrigger`
  * (admission cap, default unbounded), `partitions` (default 4).
  */
class GraftRateSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-rate"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-rate derives its schema — drop .schema()")
    (shortName(), GraftRateSourceProvider.schema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftRateSource(
      sqlContext,
      parameters.getOrElse("totalRows",
        throw new IllegalArgumentException("graft-rate needs .option(\"totalRows\", n)")).toLong,
      parameters.get("rowsPerTrigger").map(_.toLong),
      parameters.getOrElse("partitions", "4").toInt,
      metadataPath)
}

object GraftRateSourceProvider {
  val schema: StructType = StructType(Seq(
    StructField("part", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** `spark.readStream.format(...)` needs the provider CLASS name. */
  val format: String = classOf[GraftRateSourceProvider].getName

  /** The record law, shared with the spec: deterministic, mirrored by
    * the DuckDB oracle over range(). */
  def valueOf(g: Long): Long = (g * 2654435761L) % 1000000007L
}

private[sources] class GraftRateSource(
    sqlContext: SQLContext,
    totalRows: Long,
    rowsPerTrigger: Option[Long],
    partitions: Int,
    metadataPath: String = "") extends Source {

  require(totalRows >= 0 && partitions > 0, "need totalRows >= 0 and partitions > 0")

  override val schema: StructType = GraftRateSourceProvider.schema

  // the same persisted admission cursor as the snapshot sources: the
  // reported offset must never fall below the committed position after
  // a recovery (empty metadataPath = in-memory only, no FS touch)
  private val hwm =
    new HighWaterMark(metadataPath, sqlContext.sparkSession.sessionState.newHadoopConf())
  @volatile private var planned = hwm.load()

  override def getOffset: Option[Offset] = {
    val capped = rowsPerTrigger match {
      case Some(n) => math.min(totalRows, planned + n)
      case None    => totalRows
    }
    if (capped == 0L) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val to = version(end)
    planned = hwm.advance(to, planned)
    val from = start.map(version).getOrElse(0L)
    val staging =
      if (metadataPath.nonEmpty) s"$metadataPath/_rate_staging/${from}_$to"
      else s"${System.getProperty("java.io.tmpdir")}/graft_rate_${from}_$to"
    import org.apache.spark.sql.functions.{col, lit}
    // the slice is pure arithmetic over range(from, to) — distributed,
    // no driver-side row building; materialized deterministically so a
    // WAL replay rewrites identical content
    spark.range(from, math.max(from, to))
      .select(
        (col("id") % partitions).as("part"),
        org.apache.spark.sql.functions.expr(s"id div $partitions").as("seq"),
        ((col("id") * lit(2654435761L)) % lit(1000000007L)).as("value"))
      .write.mode("overwrite").parquet(staging)
    // metadataPath arrives scheme-qualified (file:/...) under a real
    // checkpoint — list through the Hadoop arm, which resolves URIs
    val io = new HadoopSnapshotIO(spark.sessionState.newHadoopConf())
    val files = io.list(staging)
      .filter(_.endsWith(".parquet")).sorted.map(n => s"$staging/$n")
    org.apache.spark.sql.graftbridge.Bridge
      .streamingParquetBatch(spark, files, schema)
  }

  private def version(o: Offset): Long = o match {
    case LongOffset(v)       => v
    case SerializedOffset(j) => j.trim.toLong
    case other               => other.json().trim.toLong
  }

  override def stop(): Unit = ()
}
