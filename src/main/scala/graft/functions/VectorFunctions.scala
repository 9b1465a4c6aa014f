package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * column expressions (`zip_with` + `aggregate`) — codegen-friendly, no
  * UDF, no driver round-trips. Accumulation is in double, sequential
  * left-to-right, so results are bit-deterministic regardless of
  * partitioning (the fold happens within one row).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

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

  /** Deterministic random-hyperplane signature bit: sign of the dot
    * product with a pseudo-random plane derived from (seed, dim index)
    * via a splitmix-style integer mix — reproducible across engines and
    * cluster sizes without shipping plane matrices.
    */
  def hyperplaneBit(vec: Column, planeId: Int, dims: Int): Column = {
    // plane component for (planeId, i): mix to [-1, 1]
    val terms = (0 until dims).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((planeId, i))
      val w = (h.toDouble / Int.MaxValue.toDouble)
      element_at(vec, i + 1).cast("double") * lit(w)
    }
    val s = terms.reduce(_ + _)
    when(s >= 0.0, 1).otherwise(0)
  }

  /** LSH bucket id from `nBits` hyperplane bits. */
  def lshBucket(vec: Column, nBits: Int, dims: Int): Column =
    (0 until nBits).map { b =>
      hyperplaneBit(vec, b, dims) * lit(1 << b)
    }.reduce(_ + _)
}
