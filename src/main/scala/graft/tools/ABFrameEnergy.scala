package graft.tools
import graft.{Fan, GraftSession, Tables}
import org.apache.spark.sql.functions._
/** Micro-benchmark behind the FrameEnergy kernel's speedup claim:
  * native codegen loop vs the interpreted higher-order fold it
  * replaced, both over the sf0.1 documents (3 reps each, rep 1 pays
  * codegen compile). Recorded warm: native ~0.2 s vs HOF ~0.6 s.
  */
object ABFrameEnergy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val hof = expr(
      """transform(
        |  filter(sequence(0, 7), k -> k * greatest(length(text) div 8, 1) < length(text)),
        |  k -> aggregate(
        |    sequence(k * greatest(length(text) div 8, 1) + 1,
        |             k * greatest(length(text) div 8, 1) + greatest(length(text) div 8, 1)),
        |    0L, (acc, i) ->
        |      acc + CAST(ascii(substring(text, CAST(i AS INT), 1)) - 64 AS BIGINT)
        |          * CAST(ascii(substring(text, CAST(i AS INT), 1)) - 64 AS BIGINT)))""".stripMargin)
    val nat = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.FrameEnergy(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("text")), 8, 64))
    def run(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      Fan.out(Tables(spark, dir).documents).select(c.as("e"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to 3) println(f"AB native $r ${run(nat)}%.2f s   hof $r ${run(hof)}%.2f s")
    spark.stop()
  }
}
