package graft.wikidata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Proleptic-Gregorian epoch microseconds from civil date-time parts,
  * as exact BIGINT Column arithmetic (Howard Hinnant's days-from-civil
  * algorithm, astronomical year numbering — the ISO-8601/chrono/DuckDB
  * `epoch_us` convention, and java.time's).
  *
  * The year is shifted by +400000 (an exact multiple of the 400-year
  * Gregorian cycle) so every intermediate division runs on non-negative
  * values: floor and truncate then agree in any engine (DuckDB's `//`
  * truncates; Spark's `div` truncates). The 1000-cycle shift is
  * subtracted back in days. Exact for years in ±~290000 (beyond that
  * the micros multiply overflows BIGINT — callers gate the range).
  */
object TimeEpoch {

  def micros(yr: Column, mo: Column, dy: Column, hh: Column, mi: Column, ss: Column): Column = {
    def idiv(c: Column, n: Long) = floor(c / lit(n)).cast("long")
    val yadj = yr - when(mo <= 2, 1L).otherwise(0L) + lit(400000L)
    val era = idiv(yadj, 400L)
    val yoe = yadj - era * 400
    val doy = idiv(lit(153L) * pmod(mo + 9, lit(12L)) + 2, 5L) + dy - 1
    val doe = yoe * 365 + idiv(yoe, 4L) - idiv(yoe, 100L) + doy
    val days = era * lit(146097L) + doe - lit(719468L) - lit(146097000L)
    days * lit(86400000000L) + (hh * 3600 + mi * 60 + ss) * lit(1000000L)
  }
}
