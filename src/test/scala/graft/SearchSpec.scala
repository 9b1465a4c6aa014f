package graft

import graft.queries.{DedupQueries, SearchQueries}
import org.apache.spark.sql.functions._

/** Behavior specs for the search-shaped operators (q94 BM25, q96
  * classifier gate, q97 repeated spans) plus the q95/q98 data-card
  * cross-checks — properties the oracle hash can't express directly
  * (cross-operator consistency, independent-formulation equivalence).
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q139: blocked inverted index — block-bounded postings, sorted " +
    "ids, df = sum of in-block counts, every term clears PostingMinDf") {
    val rows = SearchQueries.q139(spark, sf)
      .select($"term", $"block", $"df", $"n_in_block", $"postings")
      .as[(String, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (term, block, df, n, postings) =>
      val ids = postings.split(',').map(_.toLong)
      // the no-corpus-sized-cell contract: a posting list never exceeds
      // its block, and every id really lives in that block
      assert(n <= SearchQueries.PostingBlock, s"$term/$block over block cap")
      assert(ids.length == n, s"$term/$block count mismatch")
      assert(ids.forall(id => id / SearchQueries.PostingBlock == block))
      assert(ids.sameElements(ids.sorted), s"$term/$block unsorted")
      assert(df >= SearchQueries.PostingMinDf)
    }
    // term-level df is exactly the sum of its blocks (the roll-up the
    // join-back attaches), and each (term, block) appears once
    rows.groupBy(_._1).foreach { case (term, rs) =>
      assert(rs.map(_._4).sum == rs.head._3, s"$term df != sum of blocks")
      assert(rs.map(_._2).distinct.length == rs.length)
    }
  }

  test("q94: exactly TopK results, scores descending, every hit real") {
    val rows = SearchQueries.q94(spark, sf)
      .select($"doc_id", $"n_hits", $"score").collect()
    assert(rows.length == SearchQueries.TopK)
    assert(rows.forall(_.getLong(1) > 0))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q94: a document stuffed with a query term outranks the corpus") {
    // Append one synthetic doc holding ONLY repeated query terms to a
    // temp lake: BM25 must rank it first (max tf on every term, minimal
    // length penalty at its dl).
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val stuffed = (SearchQueries.QueryTerms.mkString(" ") + " ") * 10
    Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
      .union(Seq((999999L, stuffed.trim)).toDF("doc_id", "text"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val top = SearchQueries.q94(spark, dir).select($"doc_id").head().getLong(0)
    assert(top == 999999L)
  }

  test("q96: typed-pass classifier equals the independent explode+join formulation") {
    // Same model, different plan: explode tokens, md5-bucket in COLUMN
    // space, join a literal weight table, aggregate. Bit-equal integer
    // sums prove the JVM loop and the declarative form agree.
    val weights = Array.tabulate(SearchQueries.HashDim)(SearchQueries.featWeight)
    val wTab = weights.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("bucket", "wgt")
    val docs = Tables.load(spark, sf, "documents")
    val expected = docs
      .select($"doc_id", explode(graft.functions.TextFunctions.words($"text")).as("w"))
      .withColumn("bucket",
        graft.functions.DedupFunctions.md5Hash32($"w") % SearchQueries.HashDim)
      .join(broadcast(wTab), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum($"wgt").as("feat_sum"), count(lit(1)).as("n_tokens"))
    val got = SearchQueries.q96(spark, sf)
      .select($"doc_id", $"feat_sum", $"n_tokens", $"keep")
    val joined = got.join(expected.withColumnRenamed("feat_sum", "exp_sum")
        .withColumnRenamed("n_tokens", "exp_n"), Seq("doc_id"), "left")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // docs with zero tokens have no exploded rows → null expected side
      val expSum = if (r.isNullAt(4)) 0L else r.getLong(4)
      val expN = if (r.isNullAt(5)) 0L else r.getLong(5)
      assert(r.getLong(1) == expSum && r.getLong(2) == expN)
      assert(r.getBoolean(3) == (expSum > 0L))
    }
  }

  test("q97: exact twins share everything; a quoted sentence shares at any offset") {
    val W = DedupQueries.SpanW
    val body = (1 to 24).map(i => s"b$i").mkString(" ")
    val quote = (1 to W).map(i => s"q$i").mkString(" ") // exactly one window
    val dir = java.nio.file.Files.createTempDirectory("graft_spans2").toString
    Seq(
      (1L, body),                                      // twin A
      (2L, body),                                      // twin B — identical
      (3L, s"x1 x2 x3 $quote y1 y2 y3"),               // quotes mid-text
      (4L, s"$quote z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))  // quotes at offset 0
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.q97(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // twins: every one of the 24-W+1 windows is cross-doc shared
    assert(rows(1L) == (24L - W + 1, 24L - W + 1))
    assert(rows(2L) == rows(1L))
    // doc 3: 6 context words + W quote words = W+6 words → 7 windows;
    // only the pure-quote window also occurs in doc 4 (different
    // context words kill every straddling window)
    assert(rows(3L) == (7L, 1L))
    assert(rows(4L)._2 == 1L)
  }

  test("q97: a unique corpus shares nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    Seq((1L, (1 to 20).map(i => s"u$i").mkString(" ")),
        (2L, (30 to 45).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.q97(spark, dir)
      .select($"doc_id", $"n_spans", $"n_shared").collect()
    assert(rows.forall(_.getLong(2) == 0L))
    assert(rows.map(_.getLong(1)).sum ==
      (20 - DedupQueries.SpanW + 1) + (16 - DedupQueries.SpanW + 1))
  }

  test("q100: symmetric-deletion candidates are COMPLETE vs brute-force " +
    "edit distance on a typo vocabulary") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(
        j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    Seq((1L, "color colour connection conection table cable zebra"),
        (2L, "stream streams color downstream"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val words = Seq("color", "colour", "connection", "conection", "table",
      "cable", "zebra", "stream", "streams", "downstream")
    val expected = (for {
      i <- words.indices; j <- words.indices if words(i) < words(j)
      d = lev(words(i), words(j)) if d <= SearchQueries.FuzzyMaxDist
    } yield (words(i), words(j), d.toLong)).toSet
    val got = SearchQueries.q100(spark, dir)
      .select($"word_a", $"word_b", $"dist")
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
    assert(got.contains(("color", "colour", 1L)))
    assert(got.contains(("cable", "table", 1L)))
  }

  test("q95: rollup levels are mutually consistent (cells → subtotals → total)") {
    val rows = graft.queries.CorpusQueries.q95(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val cells = rows.filter(_._3 == 0L)
    val subs = rows.filter(_._3 == 1L)
    val total = rows.filter(_._3 == 3L)
    assert(total.length == 1)
    assert(total.head._4 == cells.map(_._4).sum)
    assert(total.head._5 == cells.map(_._5).sum)
    subs.foreach { case (src, _, _, nd, nt) =>
      assert(nd == cells.filter(_._1 == src).map(_._4).sum)
      assert(nt == cells.filter(_._1 == src).map(_._5).sum)
    }
  }

  test("q98: pivot rows cover every source, totals add up, absent cells are 0") {
    val docs = Tables.load(spark, sf, "documents")
    val nSources = docs.select($"source").distinct().count()
    val nDocs = docs.count()
    val rows = graft.queries.CorpusQueries.q98(spark, sf).collect()
    assert(rows.length == nSources)
    val langCols = graft.queries.CorpusQueries.PivotLangs.indices.map(_ + 1)
    rows.foreach { r =>
      val cells = langCols.map(r.getLong)
      assert(cells.forall(_ >= 0L))
      assert(cells.sum == r.getLong(langCols.last + 1)) // n_total
    }
    assert(rows.map(r => r.getLong(langCols.last + 1)).sum == nDocs)
  }

  test("q132: RRF fuses both towers — union coverage, exact scores, dual hits first") {
    val rows = SearchQueries.q132(spark, sf)
      .select($"doc_id", $"lex_rank", $"dense_rank", $"rrf_score", $"fused_rank")
      .as[(Long, Option[Long], Option[Long], Long, Long)].collect()
    val lex = SearchQueries.q94(spark, sf).select($"doc_id").as[Long].collect()
    val dense = graft.queries.VectorQueries.q37(spark, sf)
      .select($"vec_id").as[Long].collect()
    // coverage: exactly the union of the two lists, each rank faithful
    assert(rows.map(_._1).toSet == (lex ++ dense).toSet)
    rows.foreach { case (id, lr, dr, score, _) =>
      assert(lr == lex.zipWithIndex.find(_._1 == id).map(_._2 + 1L))
      assert(dr == dense.zipWithIndex.find(_._1 == id).map(_._2 + 1L))
      // score is exactly the quantized reciprocal-rank sum
      def c(r: Option[Long]) =
        r.map(x => SearchQueries.RrfScale / (SearchQueries.RrfC + x)).getOrElse(0L)
      assert(score == c(lr) + c(dr))
    }
    // fused_rank is a permutation ordered by (score desc, doc_id asc)
    val byRank = rows.sortBy(_._5)
    assert(byRank.map(_._5).toSeq == (1L to rows.length.toLong))
    assert(byRank.map(r => (-r._4, r._1)).toSeq ==
      rows.map(r => (-r._4, r._1)).sortBy(identity).toSeq)
    // any doc in BOTH lists outranks any doc whose best single rank is
    // no better than its worst (RRF's monotonicity on this data)
    val dualMin = rows.filter(r => r._2.isDefined && r._3.isDefined)
      .map(_._4).minOption
    val singleMax = rows.filter(r => r._2.isEmpty || r._3.isEmpty)
      .map(_._4).maxOption
    for (d <- dualMin; s <- singleMax) assert(d > s)
  }
}
