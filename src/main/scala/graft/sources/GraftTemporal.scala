package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The snapshot format's TEMPORAL partition transforms — `PARTITIONED
  * BY (days(ts))` / `months(ts)` / `hours(ts)` / `years(ts)` at CREATE
  * TABLE (the Iceberg hidden-partitioning family, re-expressed on
  * Spark's public V2 function machinery like [[GraftBucket]] and
  * [[GraftTruncate]]):
  *
  *   - ONE deterministic derivation ([[GraftTemporal.of]]: floored
  *     division of the epoch-micros value for hours/days, proleptic-
  *     Gregorian UTC calendar arithmetic for months/years) is shared by
  *     the write-side routing (Spark evaluates the catalog-served
  *     function), the rolling writer's file cuts (each data file holds
  *     exactly one period, recorded as a `__tpart` min==max manifest
  *     stat), and the scan's reported
  *     `KeyGroupedPartitioning(days(ts))` — two co-partitioned event
  *     tables equi-join on the raw timestamp with ZERO exchange.
  *   - Range pruning needs NO transform awareness: the raw timestamp
  *     column is always stats-tracked (epoch micros — the same value
  *     InternalRow carries), the period grouping makes per-file ranges
  *     disjoint by construction, and [[ManifestPruning]] converts
  *     pushed timestamp literals to micros — so `ts BETWEEN a AND b`
  *     plans a strict file subset from manifest lines alone.
  *
  * This is the first DDL a user migrating an event table from
  * Iceberg/Delta writes: the layout a 100 TB append-mostly fact wants
  * is time-major (every ingest lands in the open period's files, every
  * dashboard read is a time slice). UTC always — transforms must be
  * engine-invariant, never session-timezone functions.
  *
  * Reference semantics: weso/wd2duckdb stores claim times as DuckDB
  * DATETIME with a precision column (wikidata-rs/src/value.rs:271-284);
  * the distributed re-expression of "time-keyed access" is a
  * time-transform file layout whose index probe is manifest pruning.
  */
object GraftTemporal {

  /** The served transform names, in resolution order. */
  val Units: Seq[String] = Seq("years", "months", "days", "hours")

  private val HourMicros = 3600L * 1000000L
  private val DayMicros = 86400L * 1000000L

  /** Period ordinal of an epoch-micros timestamp: hours/days since
    * epoch by floored division (pre-1970 stamps group correctly);
    * months/years since 1970-01 via the proleptic-Gregorian calendar
    * in UTC (LocalDate.ofEpochDay — bit-identical to the oracle's
    * date arithmetic, no zone anywhere). */
  def of(micros: Long, unit: String): Long = unit match {
    case "hours"  => Math.floorDiv(micros, HourMicros)
    case "days"   => Math.floorDiv(micros, DayMicros)
    case "months" | "years" => ofDays(Math.floorDiv(micros, DayMicros), unit)
    case other => throw new IllegalArgumentException(
      s"unknown temporal transform '$other' — one of ${Units.mkString(", ")}")
  }

  /** Period ordinal of an epoch-days DATE value (the physical Int a
    * DateType column rides InternalRow as): days is the identity,
    * months/years via the same tz-free calendar as the micros arm.
    * Hours refuses — a date has no sub-day resolution. */
  def ofDays(days: Long, unit: String): Long = unit match {
    case "days" => days
    case "months" =>
      val d = java.time.LocalDate.ofEpochDay(days)
      (d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1)
    case "years" =>
      java.time.LocalDate.ofEpochDay(days).getYear.toLong - 1970L
    case other => throw new IllegalArgumentException(
      s"temporal transform '$other' does not apply to DATE keys — " +
        "days/months/years do")
  }
}

/** One temporal transform as a catalog-served V2 function: Spark's
  * CREATE TABLE parser produces Days/Months/Hours/YearsTransform nodes
  * whose name is the unit, and both the write's required distribution
  * and the scan's reported partitioning resolve that name through the
  * table's own FunctionCatalog — the same composition as `bucket`.
  * Like truncate's width-in-the-name trick, the transform is
  * LITERAL-FREE (one column argument), so Spark's clustering-
  * satisfaction check matches it against join keys directly. */
final case class GraftTemporalUnbound(unit: String) extends UnboundFunction {
  require(GraftTemporal.Units.contains(unit), s"unknown temporal unit $unit")

  override def name(): String = unit
  override def description(): String =
    s"$unit(ts): $unit since epoch of a TIMESTAMP key (UTC, floored)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$unit takes (col), got ${inputType.simpleString}")
    inputType.fields(0).dataType match {
      case TimestampType => new GraftTemporalTs(unit)
      case DateType if unit != "hours" => new GraftTemporalDate(unit)
      case DateType => throw new UnsupportedOperationException(
        "hours does not apply to DATE keys (no sub-day resolution) — " +
          "days/months/years do")
      case other => throw new UnsupportedOperationException(
        s"$unit key type ${other.simpleString} is not supported — temporal " +
          "transforms take TIMESTAMP or DATE keys (session-zone-free epoch units)")
    }
  }
}

private[sources] class GraftTemporalTs(unit: String)
    extends ScalarFunction[java.lang.Long] {
  override def name(): String = unit
  override def canonicalName(): String = s"graft.$unit(timestamp)"
  override def inputTypes(): Array[DataType] = Array(TimestampType)
  override def resultType(): DataType = LongType
  override def isResultNullable(): Boolean = false

  /** Magic-method fast path (TimestampType rides as epoch-micros long). */
  def invoke(v: Long): Long = GraftTemporal.of(v, unit)

  override def produceResult(input: InternalRow): java.lang.Long =
    GraftTemporal.of(input.getLong(0), unit)
}

/** The DATE-keyed variant (physical epoch-days Int). Distinct
  * canonical name — SPJ must never equate a date-derived period with a
  * timestamp-derived one across a raw date=timestamp join. */
private[sources] class GraftTemporalDate(unit: String)
    extends ScalarFunction[java.lang.Long] {
  override def name(): String = unit
  override def canonicalName(): String = s"graft.$unit(date)"
  override def inputTypes(): Array[DataType] = Array(DateType)
  override def resultType(): DataType = LongType
  override def isResultNullable(): Boolean = false

  /** Magic-method fast path (DateType rides as epoch-days int). */
  def invoke(v: Int): Long = GraftTemporal.ofDays(v.toLong, unit)

  override def produceResult(input: InternalRow): java.lang.Long =
    GraftTemporal.ofDays(input.getInt(0).toLong, unit)
}
