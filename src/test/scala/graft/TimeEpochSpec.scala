package graft

import java.time.{LocalDateTime, YearMonth, ZoneOffset}

import graft.wikidata.TimeEpoch
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The BIGINT days-from-civil arithmetic must agree with java.time's
  * proleptic-Gregorian epoch (the same astronomical-year convention
  * DuckDB's epoch_us uses) across the whole supported range — BC years,
  * year 0 (a leap year: divisible by 400), century boundaries, and the
  * range edges.
  */
class TimeEpochSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_time_micros is callable from SQL and handles BC years") {
    graft.expressions.GraftExtensions.register(spark)
    val v = spark
      .sql("SELECT graft_time_micros(-503L, 3L, 11L, 0L, 0L, 0L) AS m")
      .collect().head.getLong(0)
    assert(v === -78034320000000000L)
  }

  test("micros == java.time epoch for 500 random datetimes + edge cases") {
    val rnd = new scala.util.Random(42)
    val edges = Seq(
      (-290000, 1, 1, 0, 0, 0),
      (9998, 12, 31, 23, 59, 59),
      (0, 2, 29, 0, 0, 0),      // year 0 is a leap year (div 400)
      (-1, 12, 31, 23, 59, 59),
      (1900, 2, 28, 12, 0, 0),  // 1900: NOT a leap year (div 100)
      (2000, 2, 29, 0, 0, 0))   // 2000: leap (div 400)
    val randoms = (1 to 500).map { _ =>
      val y = rnd.between(-290000, 9999)
      val m = rnd.between(1, 13)
      val d = rnd.between(1, YearMonth.of(y, m).lengthOfMonth() + 1)
      (y, m, d, rnd.between(0, 24), rnd.between(0, 60), rnd.between(0, 60))
    }
    val cases = edges ++ randoms
    import spark.implicits._
    val df = cases
      .map { case (y, m, d, h, mi, s) => (y.toLong, m.toLong, d.toLong, h.toLong, mi.toLong, s.toLong) }
      .toDF("y", "m", "d", "h", "mi", "s")
      .withColumn(
        "got",
        TimeEpoch.micros(col("y"), col("m"), col("d"), col("h"), col("mi"), col("s")))
    val got = df.select("y", "m", "d", "h", "mi", "s", "got").collect()
    got.foreach { r =>
      val exp = LocalDateTime
        .of(r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt,
          r.getLong(3).toInt, r.getLong(4).toInt, r.getLong(5).toInt)
        .toEpochSecond(ZoneOffset.UTC) * 1000000L
      assert(r.getLong(6) === exp, s"at ${r.toSeq.take(6)}")
    }
  }
}
