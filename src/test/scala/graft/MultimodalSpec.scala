package graft

import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.{MediaCodecStub, MediaIn}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("codec stub is deterministic and total") {
    val m = MediaIn(7L, "hello world".getBytes("UTF-8"))
    val d1 = MediaCodecStub.decode(m)
    val d2 = MediaCodecStub.decode(m)
    assert(d1 == d2)
    assert(d1.n_bytes == 11L)
    assert(d1.width >= 64 && d1.width < 64 + 577)
    assert(d1.height >= 64 && d1.height < 64 + 353)
    assert(MediaCodecStub.Formats.contains(d1.format))
    // empty payload doesn't crash the decode path
    assert(MediaCodecStub.decode(MediaIn(8L, Array.emptyByteArray)).n_bytes == 0L)
  }

  test("q40 decode keeps one output row per payload with the typed schema") {
    val out = MultimodalQueries.q40(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "format"))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select($"doc_id").distinct().count() == n)
  }

  test("q41 frame sampling emits ceil(n_bytes/step) frames per doc") {
    val out = MultimodalQueries.q41(spark, sf)
      .groupBy("doc_id").count()
      .join(MultimodalQueries.q40(spark, sf), "doc_id")
      .select($"count", $"n_bytes").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (frames, bytes) =>
      assert(frames == (bytes + MultimodalQueries.FrameStep - 1) / MultimodalQueries.FrameStep)
    }
  }
}
