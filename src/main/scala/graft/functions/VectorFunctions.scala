package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * column expressions (`zip_with` + `aggregate`) — codegen-friendly, no
  * UDF, no driver round-trips. Accumulation is in double, sequential
  * left-to-right from a 0.0 seed, so results are bit-deterministic
  * regardless of partitioning (the fold happens within one row) and
  * bit-equal to DuckDB's `list_reduce` over the same product list.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** [[dot]] with the fold unrolled over a statically-known dimension:
    * `a[1]·b[1] + … + a[d]·b[d]` as a plain expression tree. Same value
    * bit-for-bit (left-associated double adds, and `0.0 + t == t`), but
    * codegen-compatible — higher-order `aggregate`/`zip_with` lambdas run
    * interpreted, which dominates pairwise-join hot paths. Use this when
    * `dims` is fixed; [[dot]] when it is data-dependent.
    */
  def dotUnrolled(a: Column, b: Column, dims: Int): Column =
    (0 until dims).map { i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double")
    }.reduce(_ + _)

  def normUnrolled(a: Column, dims: Int): Column = sqrt(dotUnrolled(a, a, dims))

  /** Cosine similarity; null/zero-norm-safe (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Deterministic pseudo-random hyperplane for LSH bucketing: component
    * i of plane `planeId` is MurmurHash3(planeId, i) scaled to [-1, 1].
    * Generated once at build time and inlined as LITERALS into both the
    * Spark plan and the oracle SQL — reproducible across engines and
    * cluster sizes without shipping plane matrices.
    */
  def planeWeights(planeId: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"plane-$planeId-$i")
      h.toDouble / Int.MaxValue.toDouble
    }

  /** Dot product of `vec` with a literal weight vector, same fold shape
    * as [[dot]] (zip_with + 0.0-seeded aggregate) so the arithmetic is
    * bit-identical on any engine that folds left-to-right. This is the
    * REFERENCE form (interpreted lambdas — fine for spec-sized frames);
    * scans use [[graft.expressions.VectorExpressions.lshBucket]], the
    * codegen'd equivalent, pinned equal by ExpressionSpec.
    */
  def dotLiteral(vec: Column, weights: Seq[Double]): Column =
    aggregate(
      zip_with(vec, array(weights.map(lit): _*),
        (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)

  /** Sign bit of the projection onto plane `planeId`. */
  def hyperplaneBit(vec: Column, planeId: Int, dims: Int): Column =
    when(dotLiteral(vec, planeWeights(planeId, dims)) >= 0.0, 1L).otherwise(0L)

  /** LSH bucket id from `nBits` hyperplane sign bits (LSB-first).
    * Vectors likely to be cosine-close land in the same bucket; the ANN
    * search then only scans the query's bucket instead of the corpus.
    */
  def lshBucket(vec: Column, nBits: Int, dims: Int): Column =
    (0 until nBits).map { b =>
      hyperplaneBit(vec, b, dims) * lit(1L << b)
    }.reduce(_ + _)
}
