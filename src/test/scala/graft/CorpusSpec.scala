package graft

import java.nio.file.Files

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("q61 counts codepoints, not UTF-16 code units") {
    // "hi😀": 2 ASCII chars + one supplementary codepoint (a surrogate
    // PAIR in UTF-16) = 3 characters, matching DuckDB's codepoint-based
    // length()/substr() semantics; code-unit counting would say 4 and
    // split the emoji into two bogus 'characters'
    val dir = Files.createTempDirectory("graft_corpus").toString
    Seq((1L, "hi😀"), (2L, "aab"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val byId = graft.queries.CorpusQueries.q61(spark, dir)
      .select($"doc_id", $"len_chars", $"entropy")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(1L)._1 == 3L) // not 4
    // three distinct equiprobable characters → exactly log2(3) bits
    assert(math.abs(byId(1L)._2 - 1.585) < 1e-9)
    // "aab": H = -(2/3 log2 2/3 + 1/3 log2 1/3) ≈ 0.9183
    assert(math.abs(byId(2L)._2 - 0.9183) < 1e-9)
  }
}
