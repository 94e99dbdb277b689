package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns. The dot-product hot
  * path is a native Catalyst expression ([[DotProduct]], full
  * whole-stage codegen); everything else composes Spark's higher-order
  * functions — no UDFs anywhere, so the same expressions run unchanged
  * on a 1000-executor cluster.
  */
object VectorFunctions {
  // classic-mode bridge between public Column and catalyst Expression
  private val EU = org.apache.spark.sql.graftbridge.Bridge
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = EU.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression = EU.expression(c)

  /** Σ aᵢ·bᵢ in double precision (native codegen'd expression;
    * summation order identical to the HOF formulation).
    */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(
      toExpr(a.cast("array<double>")),
      toExpr(b.cast("array<double>"))))

  /** Higher-order-function formulation of [[dot]] — kept as the
    * cross-check for DotProductSpec and as the fallback shape for
    * engines without the extension.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs (never null/NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** L2-normalize once at ingest so pairwise cosine becomes a plain
    * dot product — the right trade at scale (normalize 100 TB once,
    * not per candidate pair).
    *
    * The division rides `zip_with` against an `array_repeat` of the
    * norm, NOT a `transform` whose lambda divides by `n`: a lambda
    * inlines its operand subtree, so `transform(a, x => x / n)`
    * re-evaluated the whole norm (an O(d) dot product) once per
    * element — O(d²) multiply-adds per row, 128× the needed work at
    * d=128, on every ANN scan. `array_repeat`'s argument is evaluated
    * once per ROW; values (incl. null/zero-norm semantics — element
    * null ÷ norm, norm-null array-of-nulls, zero-norm passthrough)
    * are unchanged.
    */
  def l2Normalize(a: Column): Column = {
    val ad = a.cast("array<double>")
    val n = norm2(a)
    when(n === 0.0, ad)
      .otherwise(zip_with(ad, array_repeat(n, size(ad)), (x, nn) => x / nn))
  }

  /** Sign bits of `bits` random-hyperplane projections — the classic
    * cosine-LSH bucket key. Hyperplanes are derived deterministically
    * from (seed, dimension-index) via a hash → uniform in [-1, 1), so
    * executors need no broadcast of random matrices.
    */
  def randomHyperplaneSignature(vec: Column, bits: Int, seed: Int): Column = {
    val projections = (0 until bits).map { b =>
      // pseudo-random weight for (bit b, dim i): hash to [-1, 1)
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(lit(seed), lit(b), i), lit(1000003L)).cast("double") / lit(500001.5) - lit(1.0))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }
    array(projections: _*)
  }

  /** [[randomHyperplaneSignature]] with md5-derived weights instead of
    * xxhash64 — bit-for-bit reproducible in any engine with md5 (the
    * Dedup-family convention), so LSH bucketing itself can sit under a
    * cross-engine oracle. Weight(seed, bit, dim) hashes the string
    * "seed:bit:dim" → first 8 hex chars → [-1, 1).
    */
  def md5HyperplaneSignature(vec: Column, bits: Int, seed: Int): Column = {
    val projections = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => {
            val h = conv(substring(md5(concat_ws(":",
                lit(seed.toString), lit(b.toString), i.cast("string"))), 1, 8), 16, 10)
              .cast("long") % lit(1000003L)
            x.cast("double") * (h.cast("double") / lit(500001.5) - lit(1.0))
          }),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }
    array(projections: _*)
  }
}
