package graft

import graft.expressions.{FloatVectorDot, VectorExpressions}
import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("vecDot matches the declarative fold bit-for-bit on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mismatches = e.select(
      VectorExpressions.vecDot(col("embedding"), col("embedding")).as("native"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("fold"))
      .filter(!(col("native") <=> col("fold"))) // exact, not approximate
      .count()
    assert(mismatches == 0)
  }

  test("vecDot null semantics match zip_with/aggregate") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),     // 11.0
      (Some(Seq(1f, 2f)), Some(Seq(3f))),         // length mismatch → null
      (None, Some(Seq(1f, 2f))),                  // null array → null
      (Some(Seq[Float]()), Some(Seq[Float]()))    // empty → 0.0
    ).toDF("a", "b")
    val got = df.select(VectorExpressions.vecDot($"a", $"b"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(11.0), None, None, Some(0.0)))
  }

  test("interpreted eval and generated code produce the same results") {
    val expr = FloatVectorDot(
      BoundReference(0, ArrayType(FloatType), nullable = true),
      BoundReference(1, ArrayType(FloatType), nullable = true))
    val cases = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(0.1f, -0.2f), Array(-0.3f, 0.4f)))
    val proj = GenerateMutableProjection.generate(Seq(expr)) // forces doGenCode
    cases.foreach { case (a, b) =>
      val row = InternalRow(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val interpreted = expr.eval(row)
      val generated = proj(row).get(0, expr.dataType)
      assert(interpreted == generated)
    }
    // generated null paths: length mismatch and null element
    val bad = InternalRow(
      ArrayData.toArrayData(Array(1f)), ArrayData.toArrayData(Array(1f, 2f)))
    assert(proj(bad).isNullAt(0) && expr.eval(bad) == null)
  }

  test("codegen'd lshBucket matches the declarative reference bucket-for-bucket") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mismatches = e.select(
      VectorExpressions.lshBucket(col("embedding"), 8, 64).as("native"),
      VectorFunctions.lshBucket(col("embedding"), 8, 64).as("fold"))
      .filter(!(col("native") <=> col("fold")))
      .count()
    assert(mismatches == 0)
    // the documented degenerate inputs, where the two implementations
    // could legally diverge if either mishandled them: a NULL embedding
    // and a wrong-dimension embedding must yield the SAME bucket from
    // both (each hyperplane projection nulls → bit 0 on every plane)
    val degenerate = Seq(
      None,                       // null embedding
      Some(Seq(1f, 2f, 3f))       // dim 3 vs the 64-dim hyperplanes
    ).toDF("embedding")
    val pairs = degenerate.select(
      VectorExpressions.lshBucket(col("embedding"), 8, 64).as("native"),
      VectorFunctions.lshBucket(col("embedding"), 8, 64).as("fold"))
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(pairs.forall { case (n, f) => n == f }, pairs.toString)
    assert(pairs.forall(_._1.contains(0L)), pairs.toString) // all-bits-0 bucket
  }

  test("vecDotLiteral null semantics match the zip_with literal fold") {
    val df = Seq(
      Some(Seq(1f, 2f)),       // 1*0.5 + 2*(-0.25) = 0.0
      Some(Seq(1f)),           // vec SHORTER than weights → null
      Some(Seq(1f, 2f, 3f)),   // vec LONGER than weights → null (other
                               //   zip_with padding direction)
      None,                    // null array → null
      Some(Seq[Float]())       // length mismatch (0 vs 2) → null
    ).toDF("a")
    val w = Seq(0.5, -0.25)
    val native = df.select(VectorExpressions.vecDotLiteral($"a", w))
      .as[Option[Double]].collect().toSeq
    val fold = df.select(VectorFunctions.dotLiteral($"a", w))
      .as[Option[Double]].collect().toSeq
    assert(native == Seq(Some(0.0), None, None, None, None))
    assert(native == fold)
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted inputs, " +
    "including the UTF-16-vs-codepoint ordering divergence") {
    import graft.expressions.SetExpressions
    import graft.functions.DedupFunctions
    val rng = new scala.util.Random(42)
    // alphabet spans ASCII, BMP-high (U+E000..U+FFFF region via U+F8FF),
    // and supplementary-plane chars (surrogate pairs) — exactly where
    // Java String.compareTo and code-point order diverge
    val alphabet = Seq("a", "zz", "tok", "\uF8FF", "\uE000x",
      new String(Character.toChars(0x1F600)), // emoji, supplementary
      new String(Character.toChars(0x10348)), "mix\uF8FF",
      "mix" + new String(Character.toChars(0x1F600)))
    def randSet(): Array[String] = {
      val n = rng.nextInt(6) + 1
      val picked = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size))).distinct.toArray
      java.util.Arrays.sort(picked,
        (x: String, y: String) => DedupFunctions.codePointCompare(x, y))
      picked
    }
    val rows = Seq.fill(200)((randSet().toSeq, randSet().toSeq))
    val df = rows.toDF("a", "b")
    val got = df.select(
      SetExpressions.intersectSizeSorted($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin"))
      .filter(!($"native" <=> $"builtin")).count()
    assert(got == 0)
    // and against a plain JVM set intersection (one collect, in order)
    val natives = df.select(SetExpressions.intersectSizeSorted($"a", $"b"))
      .as[Int].collect().toSeq
    val expected = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(natives == expected)
    // null array -> null, matching non-legacy size(array_intersect)
    val z = Seq((Option.empty[Seq[String]], Option(Seq("a"))))
      .toDF("a", "b")
      .select(SetExpressions.intersectSizeSorted($"a", $"b"))
      .as[Option[Int]].head()
    assert(z.isEmpty)
  }

  test("vec_dot and vec_cosine are registered as SQL functions via GraftExtensions") {
    Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("v")
    val got = spark.sql("SELECT vec_dot(a, b) AS d FROM v").as[Double].head()
    assert(got == 11.0)
    val cos = spark.sql("SELECT vec_cosine(a, a) AS c FROM v").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    // zero-norm guard → null, same as the Column API
    val z = spark.sql("SELECT vec_cosine(a, array(CAST(0 AS FLOAT), CAST(0 AS FLOAT))) AS c FROM v")
      .as[Option[Double]].head()
    assert(z.isEmpty)
  }
}
