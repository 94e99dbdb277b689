package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`, `aggregate`) — no UDFs
  * in the hot path, so whole-stage codegen stays intact and the same
  * expressions run unchanged on a 1000-executor cluster.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
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
    */
  def l2Normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, a.cast("array<double>"))
      .otherwise(transform(a, x => x.cast("double") / n))
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
}
