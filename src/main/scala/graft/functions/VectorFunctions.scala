package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over Array[Float] embedding columns, as Column
  * expressions (zip_with/aggregate stay inside codegen).
  *
  * Exact-dot discipline: float sums are order-sensitive in IEEE, and
  * engines round double->decimal differently (DuckDB scales in binary,
  * Spark via exact BigDecimal), so no floating path is portable. Instead
  * elements are quantized to a 1e-6 grid as BIGINT — x*1e6 is the same
  * IEEE double everywhere and both engines round it half-away-from-zero
  * — and dots are exact integer sums. Cosines computed from those
  * integers are bit-identical across engines.
  *
  * Oracle mirror for dotExact(a, b):
  *   (SELECT SUM(CAST(round(CAST(a[i] AS DOUBLE)*1000000) AS BIGINT)
  *             * CAST(round(CAST(b[i] AS DOUBLE)*1000000) AS BIGINT))
  *    FROM UNNEST(range(1, len(a)+1)) t(i))
  */
object VectorFunctions {

  private def quant(x: Column): Column =
    round(x.cast("double") * 1000000).cast("long")

  /** Quantize a float vector once — pairwise operators must work over
    * pre-quantized arrays (quantizing inside the pair join would redo
    * 2x64 rounds per PAIR instead of 64 per VECTOR). */
  def quantize(a: Column): Column = transform(a, x => quant(x))

  /** Exact integer dot product over pre-quantized vectors — native
    * codegen expression (graft.expressions.DotQ); see dotQInterpreted
    * for the equivalent higher-order-function formulation. */
  def dotQ(qa: Column, qb: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.DotQ(
        org.apache.spark.sql.graftbridge.Bridge.expression(qa),
        org.apache.spark.sql.graftbridge.Bridge.expression(qb)))

  /** Interpreted formulation (zip_with/aggregate) — kept as the
    * reference semantics for DotQ's spec. */
  def dotQInterpreted(qa: Column, qb: Column): Column =
    aggregate(
      zip_with(qa, qb, (x, y) => x * y),
      lit(0L),
      (acc, x) => acc + x)

  def normSqQ(qa: Column): Column = dotQ(qa, qa)

  /** Exact integer dot product over raw float vectors (one-shot use). */
  def dotExact(a: Column, b: Column): Column = dotQ(quantize(a), quantize(b))

  def normSqExact(a: Column): Column = dotExact(a, a)

  /** Cosine from a precomputed exact dot and exact squared norms. */
  def cosineFrom(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Plain double dot product — engine-internal paths (LSH/IVF scoring)
    * where no cross-engine comparison happens. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Random-hyperplane signatures with CONSTANT ±1 planes derived from
    * MD5 at plan-build time (not per row, and not engine-specific), so
    * the identical bucket is computable in DuckDB — the portability
    * trick that lets LSH-bucketed operators keep full SQL oracles.
    * Over pre-quantized integer vectors the plane dot is an exact
    * integer sum, so the sign (= the bucket bit) can never diverge
    * between engines. The per-plane dot is emitted as a FLAT ±element
    * sum (64 adds), which stays inside whole-stage codegen — no
    * interpreted higher-order functions in the hot path. */
  def planeSigns(bits: Int, dim: Int): Seq[Seq[Int]] =
    (0 until bits).map { j =>
      val d = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"graft_plane_$j".getBytes("UTF-8"))
      (0 until dim).map(i => if (((d(i / 8) >> (i % 8)) & 1) == 1) 1 else -1)
    }

  /** bits-wide LSH bucket of a quantized vector (bit j set iff the
    * plane-j dot is >= 0). */
  def hyperBucket(qv: Column, bits: Int = 8, dim: Int = 64): Column =
    planeSigns(bits, dim).zipWithIndex.map { case (signs, j) =>
      val dotJ = signs.zipWithIndex.map { case (sg, i) =>
        if (sg > 0) element_at(qv, i + 1) else -element_at(qv, i + 1)
      }.reduce(_ + _)
      when(dotJ >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The exact DuckDB mirror of [[hyperBucket]] over a quantized-vector
    * SQL expression (1-based list indexing). */
  def hyperBucketSql(qv: String, bits: Int = 8, dim: Int = 64): String =
    planeSigns(bits, dim).zipWithIndex
      .map { case (signs, j) =>
        val dotJ = signs.zipWithIndex
          .map { case (sg, i) => (if (sg > 0) "+" else "-") + s"$qv[${i + 1}]" }
          .mkString
        s"(CASE WHEN ($dotJ) >= 0 THEN ${1L << j} ELSE 0 END)"
      }
      .mkString("(", " + ", ")")
}
