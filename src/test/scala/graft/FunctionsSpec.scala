package graft

import java.sql.Timestamp

import graft.functions.{GeoFunctions, TextFunctions, TimeFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    spark.range(1).select(c.as[T](e)).head()

  // ---- GeoFunctions (F2) ----

  test("haversine matches known distances within spherical-model error") {
    // Tel Aviv → Jerusalem, geodesic ≈ 54.1 km
    val tlvJlm = one[Double](GeoFunctions.haversineMeters(
      lit(32.0853), lit(34.7818), lit(31.7683), lit(35.2137)))
    assert(tlvJlm > 52000 && tlvJlm < 56000)
    // one degree of longitude at the equator ≈ 111.19 km
    val oneDeg = one[Double](GeoFunctions.haversineMeters(
      lit(0.0), lit(0.0), lit(0.0), lit(1.0)))
    assert(math.abs(oneDeg - 111195) < 200)
    // zero distance, and null-safety
    assert(one[Double](GeoFunctions.haversineMeters(
      lit(10.0), lit(20.0), lit(10.0), lit(20.0))) == 0.0)
    val nul = spark.range(1).select(GeoFunctions.haversineMeters(
      lit(null).cast("double"), lit(20.0), lit(10.0), lit(20.0)).as("d"))
      .head().isNullAt(0)
    assert(nul)
  }

  // ---- TimeFunctions (F6/F13, §7.5.1) ----

  test("Israel-local conversion uses the DST offset of the target date") {
    val df = Seq(
      Timestamp.valueOf("2024-01-15 12:00:00"), // winter: UTC+2
      Timestamp.valueOf("2024-07-15 12:00:00"), // summer (IDT): UTC+3
      // the 2024 IDT transition day (clocks jump 02:00→03:00 on Mar 29):
      // one instant before the jump, one after — offsets must differ
      Timestamp.valueOf("2024-03-28 23:30:00"),
      Timestamp.valueOf("2024-03-29 01:30:00")
    ).toDF("ts")
    val got = df.select(TimeFunctions.israelIso($"ts")).as[String].collect().toSeq
    assert(got == Seq(
      "2024-01-15 14:00:00", "2024-07-15 15:00:00",
      "2024-03-29 01:30:00",  // still +2
      "2024-03-29 04:30:00")) // after the spring-forward: +3
    // round-trip through fromIsraelLocal restores the instants (F13's
    // documented fix: the offset of the TARGET date, not today's)
    val back = df.select(TimeFunctions.fromIsraelLocal(
      TimeFunctions.toIsraelLocal($"ts"))).as[Timestamp].collect().toSeq
    assert(back == df.select($"ts").as[Timestamp].collect().toSeq)
  }

  test("snapshot id round-trips and journeyRefKey matches the reference formula") {
    val t = Timestamp.valueOf("2024-03-05 07:09:00")
    val df = Seq(t).toDF("ts")
    val sid = df.select(TimeFunctions.toSnapshotId($"ts")).as[String].head()
    assert(sid == "2024/03/05/07/09")
    val back = df.select(TimeFunctions.parseSnapshotId(
      TimeFunctions.toSnapshotId($"ts"))).as[Timestamp].head()
    assert(back == t)
    // split_part is 1-based, Spark split 0-based; century dropped (F3)
    val key = Seq("2023-05-11-42-7").toDF("jr")
      .select(TimeFunctions.journeyRefKey($"jr")).as[String].head()
    assert(key == "42_110523")
  }

  // ---- TextFunctions ----

  test("tokenization and shingles") {
    val df = Seq("a b c d").toDF("t")
    assert(df.select(TextFunctions.tokenCountWs($"t")).as[Int].head() == 4)
    assert(df.select(TextFunctions.wordShingles($"t", 3)).as[Seq[String]].head()
      == Seq("a b c", "b c d"))
    assert(df.select(TextFunctions.charShingles($"t", 3)).as[Seq[String]].head().size
      == 5) // "a b c d".length - 2
    // fewer words than n → empty, not null
    assert(Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3)).as[Seq[String]].head().isEmpty)
    // leading/trailing whitespace doesn't create tokens
    assert(Seq("  a  b  ").toDF("t")
      .select(TextFunctions.tokenCountWs($"t")).as[Int].head() == 2)
  }

  test("quality signals: ratios and bounds") {
    assert(Seq("ab,.").toDF("t")
      .select(TextFunctions.punctRatio($"t")).as[Double].head() == 0.5)
    assert(Seq("the cat").toDF("t")
      .select(TextFunctions.stopwordRatio($"t")).as[Double].head() == 0.5)
    // empty text: every signal is 0, no division-by-zero null
    val empty = Seq("").toDF("t").select(
      TextFunctions.punctRatio($"t"), TextFunctions.stopwordRatio($"t"),
      TextFunctions.qualityScore($"t")).as[(Double, Double, Double)].head()
    assert(empty == ((0.0, 0.0, 0.0)))
    // quality is within [0, 1]
    val q = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(TextFunctions.qualityScore($"t")).as[Double].head()
    assert(q >= 0.0 && q <= 1.0)
  }

  // ---- VectorFunctions ----

  test("dot / cosine / l2 on known vectors") {
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot($"a", $"b")).as[Double].head() == 11.0)
    assert(df.select(VectorFunctions.cosine($"a", $"a")).as[Double].head()
      === 1.0 +- 1e-12)
    assert(Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).as[Double].head() == 0.0)
    assert(Seq((Seq(0f, 3f), Seq(4f, 0f))).toDF("a", "b")
      .select(VectorFunctions.l2Distance($"a", $"b")).as[Double].head() == 5.0)
    // zero-norm → null, not NaN
    assert(Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
  }

  implicit private class DoubleOps(d: Double) {
    def +-(tol: Double) = (d - tol, d + tol)
  }
  implicit private class DoubleCmp(d: Double) {
    def ===(range: (Double, Double)): Boolean = d >= range._1 && d <= range._2
  }

  test("lsh bucket is stable and bounded") {
    val df = Seq(Tuple1((0 until 64).map(i => (i + 1) * 0.01f))).toDF("v")
    val b1 = df.select(VectorFunctions.lshBucket($"v", 8, 64)).as[Long].head()
    val b2 = df.select(VectorFunctions.lshBucket($"v", 8, 64)).as[Long].head()
    assert(b1 == b2 && b1 >= 0 && b1 < 256)
    // scaling a vector doesn't change its bucket (sign bits are
    // projection signs — cosine-LSH invariance)
    val scaled = Seq(Tuple1((0 until 64).map(i => (i + 1) * 0.02f))).toDF("v")
    assert(scaled.select(VectorFunctions.lshBucket($"v", 8, 64)).as[Long].head() == b1)
  }

  // ---- TextJvm.charBigramKeys (q166's packed bigram key) ----

  test("charBigramKeys packs exactly the adjacent codepoint pairs, " +
    "including supplementary-plane codepoints") {
    import graft.functions.TextJvm
    // "a😀b" is 4 UTF-16 units but 3 CODEPOINTS — the packing must pair
    // codepoints, not chars (a char-indexed walk would emit a lone
    // surrogate as a phantom context)
    val txt = "a😀b"
    val cps = txt.codePoints().toArray
    val expected = cps.sliding(2).map(p =>
      (p(0).toLong << TextJvm.BigramShift) | p(1).toLong).toSeq
    assert(TextJvm.charBigramKeys(txt).toSeq == expected)
    assert(expected.size == 2)
    // injectivity at the boundary: max codepoint fits below the shift
    assert(Character.MAX_CODE_POINT < (1 << TextJvm.BigramShift))
    // degenerate inputs: empty and single-codepoint docs emit nothing
    assert(TextJvm.charBigramKeys("").isEmpty)
    assert(TextJvm.charBigramKeys("😀").isEmpty)
    // the context recovery q166's SQL side performs is the packing's
    // exact inverse for the FIRST codepoint
    assert(TextJvm.charBigramKeys("xy")
      .forall(k => (k >>> TextJvm.BigramShift) == 'x'.toLong))
  }
}
