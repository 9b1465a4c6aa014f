package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.functions.DedupFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval and model-inference scoring over `documents` —
  * the search-shaped operators of a training-data pipeline: BM25 top-k
  * (the classic inverted-index ranking, here expressed Spark-first) and
  * hashing-trick linear-classifier inference (the fastText-style
  * quality/domain gate real pipelines run over every document).
  *
  * Scale shape: both operators touch the corpus text exactly once in a
  * narrow typed pass; everything that crosses an exchange afterwards is
  * compact numeric rows. Corpus-derived model state (document
  * frequencies, average length) is a BOUNDED driver-side collect — a
  * handful of scalars, the quantizerCentroids discipline (model, never
  * data).
  */
object SearchQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The literal query — shared verbatim with the DuckDB oracle (the
    * MinHash-constant discipline). Term order is part of the contract:
    * the per-document score folds contributions in THIS order on both
    * engines, so the double sum is bit-reproducible.
    */
  val QueryTerms: Seq[String] = Seq("hash", "join", "merge", "vector")
  /** Standard BM25 parameters (Robertson/Sparck Jones defaults). */
  val K1 = 1.2
  val B = 0.75
  val TopK = 15

  /** Per-document (length, per-term tf) in ONE narrow typed pass — the
    * q52 hot-path shape: split once, count all query terms in a single
    * JVM loop. At 100 TB this is the only pass that reads text; the
    * output is |corpus| compact rows of (long, long, |Q| longs).
    *
    * A production engine would serve repeated ad-hoc queries from a
    * materialized inverted index (term-bucketed posting lists — the
    * [[graft.sources.BucketedLake]] layout applies as-is); for a single
    * scoring run the one-pass scan IS the optimal plan: building the
    * index costs the same full scan plus a token-keyed shuffle.
    */
  private[queries] def termStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val terms = QueryTerms.toArray
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        val tfs = new Array[Long](terms.length)
        var i = 0
        while (i < ws.length) {
          var j = 0
          while (j < terms.length) {
            if (ws(i) == terms(j)) tfs(j) += 1L
            j += 1
          }
          i += 1
        }
        (id, ws.length.toLong, tfs)
      }
      .toDF("doc_id", "dl", "tfs")
  }

  /** q94 — BM25 top-[[TopK]] retrieval for [[QueryTerms]]:
    * `score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * the Lucene idf `ln(1 + (N−df+0.5)/(df+0.5))`.
    *
    * Plan: the [[termStats]] pass is materialized once (two
    * consumers); corpus statistics (N, Σdl, per-term df) are ONE
    * aggregate collected as a single row — 2+|Q| scalars of driver
    * state. Scoring is then a pure column projection with the idfs as
    * literals, and the cut is TakeOrderedAndProject (top-k heap per
    * partition + driver merge of K·partitions rows, never a global
    * sort).
    *
    * Float discipline: contributions fold left-to-right in QueryTerms
    * order on both engines (IEEE addition order pinned); idf's `ln` is
    * the one 1-ulp-risk transcendental, carried under round-6 exactly
    * like q61's entropy ln (CORRECTNESS gates it empirically). Ordering
    * uses the ROUNDED score so both engines cut the same top-k; exact
    * duplicates tie and break deterministically on doc_id.
    */
  def q94(s: SparkSession, dir: String): DataFrame =
    q94From(termStats(s, dir).materialize())

  /** BM25 scoring over a PREBUILT (already-materialized) [[termStats]]
    * frame — the entry q103 uses so its eval shares one checkpointed
    * text pass between ranking and relevance flags (round-7 advisory:
    * the old shape scanned and checkpointed the corpus twice per eval
    * run). Callers own materialization: pass a materialized frame,
    * since scoring consumes it twice (the stats aggregate + the
    * projection).
    */
  private[queries] def q94From(stats: DataFrame): DataFrame = {
    val aggCols = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
      QueryTerms.indices.map(i =>
        sum(when(col("tfs").getItem(i) > 0L, 1L).otherwise(0L)).as(s"df_$i"))
    val row = stats.agg(aggCols.head, aggCols.tail: _*).head()
    val n = row.getLong(0)
    val sumdl = row.getLong(1)
    val dfs = QueryTerms.indices.map(i => row.getLong(2 + i))
    val avgdl = sumdl.toDouble / n.toDouble
    val idfs = dfs.map(df =>
      math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)))
    val norm: Column =
      lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / lit(avgdl)))
    val score = QueryTerms.indices.map { i =>
      val tf = col("tfs").getItem(i).cast("double")
      lit(idfs(i)) * ((tf * lit(K1 + 1.0)) / (tf + norm))
    }.reduceLeft(_ + _)
    val hits = QueryTerms.indices.map(i => col("tfs").getItem(i)).reduceLeft(_ + _)
    stats
      .withColumn("n_hits", hits)
      .filter(col("n_hits") > 0L)
      .withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)
      .select(col("doc_id"), col("dl"), col("n_hits"), col("score"))
  }

  /** Feature-hash dimensionality of the q96 classifier. */
  val HashDim = 64

  /** The shipped model: integer per-mille logit weights derived from a
    * fixed multiplicative-hash formula — deterministic stand-in for
    * trained weights (what ships is an array of numbers either way).
    * Integer weights keep the document score EXACT: the sum is
    * order-free, so no float-fold caveat anywhere in q96.
    */
  def featWeight(i: Int): Long = ((i.toLong * 2654435761L) % 2003L) - 1001L

  /** q96 — hashing-trick linear classifier inference (the fastText-
    * style quality/domain gate): every token hashes into one of
    * [[HashDim]] feature buckets (md5, the engine-wide hash), the
    * document logit is the exact integer sum of bucket weights over all
    * token OCCURRENCES (tf-weighted by construction), and the gate
    * keeps logit > 0. One narrow typed pass, zero exchanges — at
    * 100 TB this is embarrassingly parallel scan work, and a real
    * trained model drops in by replacing [[featWeight]]'s formula with
    * a literal array.
    */
  private val Weights: Array[Long] = Array.tabulate(HashDim)(featWeight)

  /** The q96 document logit evaluated JVM-side — ONE definition shared
    * by the query and the corpus-prepare scoring pass
    * ([[graft.jobs.CorpusPrepare.score]]), so the DAG's
    * `quality_gate=classifier` keeps exactly the q96 `keep` set.
    */
  def classifierFeatSum(text: String): Long = {
    val ws = text.split("\\s+").filter(_.nonEmpty)
    var sum = 0L
    var i = 0
    while (i < ws.length) {
      sum += Weights((DedupFunctions.md5Hash32Jvm(ws(i)) % HashDim).toInt)
      i += 1
    }
    sum
  }

  def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, text.split("\\s+").count(_.nonEmpty).toLong,
          classifierFeatSum(text))
      }
      .toDF("doc_id", "n_tokens", "feat_sum")
      .select(col("doc_id"), col("n_tokens"), col("feat_sum"),
        round(col("feat_sum").cast("double") / lit(1000.0), 6).as("logit"),
        (col("feat_sum") > 0L).as("keep"))
  }

  /** Max verified edit distance of the q100 fuzzy join. */
  val FuzzyMaxDist = 2

  /** All strings reachable from `w` by deleting up to [[FuzzyMaxDist]]
    * codepoints, including `w` itself — the symmetric-deletion
    * neighborhood (SymSpell, Garbe): two words are within edit
    * distance d iff their depth-d deletion neighborhoods intersect,
    * so a hash-join on variants yields a COMPLETE candidate set for
    * the exact verify. Codepoint-indexed to stay aligned with DuckDB's
    * substr semantics (the q61 discipline).
    */
  private[queries] def deletionVariants(w: String): Set[String] = {
    def delOne(x: String): Iterator[String] = {
      val cps = x.codePoints().toArray
      Iterator.range(0, cps.length).map { i =>
        val b = new java.lang.StringBuilder
        var j = 0
        while (j < cps.length) {
          if (j != i) b.appendCodePoint(cps(j))
          j += 1
        }
        b.toString
      }
    }
    var out = Set(w)
    var frontier = Set(w)
    var d = 0
    while (d < FuzzyMaxDist) {
      frontier = frontier.flatMap(delOne)
      out ++= frontier
      d += 1
    }
    out
  }

  /** q100 — fuzzy vocabulary self-join (typo/variant discovery): all
    * distinct corpus-word pairs within Levenshtein distance
    * [[FuzzyMaxDist]], with corpus frequencies — the normalization
    * table a cleaning pass folds rare misspellings onto their frequent
    * forms with.
    *
    * Two-phase like MinHash→Jaccard: a symmetric-deletion candidate
    * join (complete for ED ≤ d — no recall loss), then the exact
    * `levenshtein` verify on candidates only. Scale shape: the corpus
    * is touched once by the vocabulary explode+count (the q64 shape);
    * everything after is VOCABULARY-sized (bounded by language, ~10⁷
    * words at web scale, not corpus-sized), shuffling (word, variant)
    * pairs on the variant key — O(vocab·len²) rows vs the O(vocab²)
    * all-pairs a naive fuzzy join runs. Joins are pinned sort-merge:
    * every input is stats-blind behind a checkpoint (q77 lesson).
    */
  def q100(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = t(s, dir, "documents")
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // three consumers: variant generation + two freq join-backs
      .materialize()
    val variants = vocab.select(col("w")).as[String]
      .flatMap(w => deletionVariants(w).iterator.map(v => (w, v)))
      .toDF("word", "v")
      .materialize() // both sides of the candidate self-join
    val cand = variants.toDF("word_a", "v")
      .join(variants.toDF("word_b", "v").hint("merge"), Seq("v"))
      .filter(col("word_a") < col("word_b"))
      .select("word_a", "word_b").distinct()
    cand
      .filter(levenshtein(col("word_a"), col("word_b")) <= FuzzyMaxDist)
      .withColumn("dist",
        levenshtein(col("word_a"), col("word_b")).cast("long"))
      .join(vocab.toDF("word_a", "freq_a").hint("merge"), Seq("word_a"))
      .join(vocab.toDF("word_b", "freq_b").hint("merge"), Seq("word_b"))
      .select("word_a", "word_b", "dist", "freq_a", "freq_b")
  }

  /** q103 — retrieval EVALUATION: precision@k, recall@k and MRR of the
    * q94 BM25 ranking against a term-containment relevance oracle
    * (relevant ⇔ the document contains EVERY query term) — the eval
    * harness a retrieval pipeline runs after every index/scorer change
    * (RecallSpec plays this role for the ANN side; this is the
    * lexical twin, and it ships as a query so the metric itself is
    * hash-gated cross-engine).
    *
    * Scale shape: the ranked list is [[TopK]] rows — a bounded driver
    * collect (the q89 float-top pattern) re-emitted as a literal rank
    * table; the relevance flags ride the SAME checkpointed termStats
    * pass q94 scores from; both aggregates are single compact rows.
    * Metric rounding: 1/rank and hit ratios are either non-terminating
    * decimals or exactly-representable dyadics — both engines' round()
    * agree on every case (the q102 lesson applied in design).
    */
  def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = termStats(s, dir).materialize()
    val relFlag = QueryTerms.indices
      .map(i => col("tfs").getItem(i) > 0L).reduceLeft(_ && _)
    val rel = stats.select(col("doc_id"), relFlag.as("is_rel"))
    val topIds: Array[Long] =
      q94From(stats).select(col("doc_id")).as[Long].collect()
    val ranked = topIds.zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }.toSeq
      .toDF("doc_id", "rank")
    val hitAgg = ranked.join(rel, Seq("doc_id"), "left")
      .agg(
        coalesce(sum(when(col("is_rel"), 1L).otherwise(0L)), lit(0L))
          .as("n_hits_topk"),
        min(when(col("is_rel"), col("rank"))).as("best_rank"))
    val relAgg = rel.agg(
      coalesce(sum(when(col("is_rel"), 1L).otherwise(0L)), lit(0L))
        .as("n_relevant"))
    hitAgg.crossJoin(relAgg)
      .select(col("n_relevant"), col("n_hits_topk"), col("best_rank"),
        round(col("n_hits_topk").cast("double") / lit(TopK.toDouble), 4)
          .as("precision_at_k"),
        when(col("n_relevant") > 0L,
          round(col("n_hits_topk").cast("double") /
            col("n_relevant").cast("double"), 4)).as("recall_at_k"),
        when(col("best_rank").isNotNull,
          round(lit(1.0) / col("best_rank").cast("double"), 4))
          .otherwise(lit(0.0)).as("mrr"))
  }

  /** RRF constants (Cormack/Clarke/Buettcher 2009's k=60, fixed-point
    * scale 10⁹): contribution of a rank-r hit is `RrfScale div (RrfC + r)`
    * — exact positive-integer floor division on both engines, so the
    * fused score hash-gates (a float 1/(k+r) sum would be fold-order
    * bait for nothing: the quantized contributions preserve the exact
    * RRF ordering for every list shorter than 10⁹ − 60 entries).
    */
  val RrfC = 60L
  val RrfScale = 1000000000L

  /** q132 — RECIPROCAL-RANK-FUSION hybrid retrieval: fuse the lexical
    * BM25 top-[[TopK]] (q94) with the dense exact-cosine top-10 (q37 —
    * the `documents`/`embeddings` lakes share one id space) by RRF:
    * `score(d) = Σ_lists RrfScale div (RrfC + rank_list(d))`. The
    * standard two-tower retrieval pattern (sparse + dense, fused
    * rank-side so neither scorer's scale dominates) that RAG and
    * curation pipelines run as their first stage; documents found by
    * BOTH towers float to the top, single-tower hits keep their
    * reciprocal weight.
    *
    * Scale shape: both input rankings are top-k lists — bounded driver
    * collects re-emitted as literal rank tables (the q103 pattern; at
    * 100 TB each tower's candidate generation is the distributed part,
    * already bucket-pruned/TakeOrdered — fusion itself is k+k rows).
    * The fused order is exact integer arithmetic with a doc_id
    * tie-break, so the full frame hash-gates cross-engine.
    */
  def q132(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lexIds: Array[Long] =
      q94(s, dir).select(col("doc_id")).as[Long].collect()
    val denseIds: Array[Long] =
      VectorQueries.q37(s, dir).select(col("vec_id")).as[Long].collect()
    def rankTable(ids: Array[Long], rankCol: String): DataFrame =
      ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }.toSeq
        .toDF("doc_id", rankCol)
    val fused = rankTable(lexIds, "lex_rank")
      .join(rankTable(denseIds, "dense_rank"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        (coalesce(expr(s"$RrfScale div ($RrfC + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfC + dense_rank)"), lit(0L)))
          .as("rrf_score"))
    fused.withColumn("fused_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf_score").desc, col("doc_id").asc)).cast("long"))
  }

  /** q139's index geometry: terms below [[PostingMinDf]] documents are
    * left to the scan path (a rare term's postings are cheaper to
    * re-derive than to store), and posting lists are split into
    * [[PostingBlock]]-doc-id blocks so no output array is ever
    * corpus-sized. Shared with the oracle.
    */
  val PostingMinDf = 20L
  val PostingBlock = 1000L

  /** q139 — BLOCKED INVERTED-INDEX build: materialize, for every term
    * with document frequency ≥ [[PostingMinDf]], its sorted posting
    * lists split by doc-id block — the index the q94 scaladoc points
    * at for repeated ad-hoc retrieval (one scan amortized over every
    * future query), in the BLOCKED layout real engines ship
    * (block-max WAND): per (term, block) the in-block postings plus
    * the term-level df, so a scorer skips whole blocks and no single
    * row ever carries a corpus-sized array — the stopword posting
    * list that would otherwise be one multi-GB cell at 100 TB arrives
    * as bounded ≤ [[PostingBlock]]-entry chunks instead.
    *
    * Scale shape: one explode+distinct shuffle on (term, doc) — the
    * classic index-build exchange — then a (term, block) partial agg
    * whose arrays are block-bounded by construction; the df roll-up
    * and its join-back run on the index-sized frame, not the corpus.
    * Sorted arrays + exact counts: fully hash-gated cross-engine.
    */
  def q139(s: SparkSession, dir: String): DataFrame = {
    val docTerms = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      .distinct()
    val blocks = docTerms
      .groupBy(col("term"), expr(s"doc_id div $PostingBlock").as("block"))
      .agg(count(lit(1)).as("n_in_block"),
        sort_array(collect_set(col("doc_id"))).as("postings"))
      .materialize() // two consumers: the df roll-up + the join-back
    val df = blocks.groupBy("term")
      .agg(sum(col("n_in_block")).as("df"))
      .filter(col("df") >= PostingMinDf)
    blocks.join(df.hint("merge"), Seq("term"))
      .select(col("term"), col("block"), col("df"), col("n_in_block"),
        // Comma-joined string, not ARRAY<BIGINT>: the cross-engine gate
        // canonicalizes rows by sorting on every column, and a raw array
        // column is unhashable there. The join preserves full information
        // (postings are sorted, ids are integers, ',' never occurs).
        expr("array_join(transform(postings, x -> cast(x AS string)), ',')")
          .as("postings"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_inverted_index" -> (q139 _),
    "q132_rrf_fusion" -> (q132 _),
    "q94_bm25_topk" -> (q94 _),
    "q96_classifier_gate" -> (q96 _),
    "q100_fuzzy_join" -> (q100 _),
    "q103_retrieval_eval" -> (q103 _))

  // ---- oracle SQL ----

  private def qtermsSql: String =
    QueryTerms.map(w => s"'$w'").mkString("[", ", ", "]")

  private def weightsSql: String =
    Array.tabulate(HashDim)(featWeight).mkString("[", ", ", "]")

  /** The shared q94 scoring CTE chain (d → t → s → scored) — the BM25
    * replay both the q94 and q103 oracles build on. Contributions fold
    * left-to-right in QueryTerms order — the same IEEE addition order
    * as the Spark column chain.
    */
  private def bm25CtesSql: String = {
    val dfCols = QueryTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tfs[${i + 1}] > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
      .mkString(",\n  ")
    val hitsExpr = QueryTerms.indices.map(i => s"tfs[${i + 1}]").mkString(" + ")
    val scoreExpr = QueryTerms.indices.map { i =>
      s"""ln(1 + (CAST(s.n AS DOUBLE) - CAST(s.df_$i AS DOUBLE) + 0.5)
         |     / (CAST(s.df_$i AS DOUBLE) + 0.5))
         |  * ((CAST(tfs[${i + 1}] AS DOUBLE) * CAST(${K1 + 1.0} AS DOUBLE))
         |     / (CAST(tfs[${i + 1}] AS DOUBLE)
         |        + CAST($K1 AS DOUBLE) * (CAST(${1.0 - B} AS DOUBLE)
         |          + CAST($B AS DOUBLE) * (CAST(t.dl AS DOUBLE)
         |            / (CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE))))))""".stripMargin
    }.mkString("\n  + ")
    s"""d AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
       |t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
       |  list_transform($qtermsSql, q -> CAST(len(list_filter(ws, w -> w = q)) AS BIGINT)) AS tfs
       | FROM d),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |  $dfCols
       | FROM t),
       |scored AS (
       | SELECT t.doc_id, t.dl, $hitsExpr AS n_hits,
       |  $scoreExpr AS raw
       | FROM t CROSS JOIN s)""".stripMargin
  }

  private def q132OracleSql: String = {
    val vq = VectorQueries.QueryVecId
    val cos = DedupQueries.cosineSql("e.embedding", "q.qv")
    val rrf = s"""coalesce($RrfScale // ($RrfC + f.lex_rank), 0)
                 | + coalesce($RrfScale // ($RrfC + f.dense_rank), 0)""".stripMargin
    s"""WITH $bm25CtesSql,
       |lex AS (
       | SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY round(raw, 6) DESC, doc_id ASC) AS BIGINT) AS lex_rank
       | FROM scored WHERE n_hits > 0
       | ORDER BY round(raw, 6) DESC, doc_id ASC LIMIT $TopK),
       |dense AS (
       | SELECT e.vec_id AS doc_id,
       |  CAST(row_number() OVER (ORDER BY $cos DESC, e.vec_id ASC) AS BIGINT) AS dense_rank
       | FROM embeddings e
       | CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = $vq) q
       | WHERE e.vec_id <> $vq
       | ORDER BY $cos DESC, e.vec_id ASC LIMIT ${VectorQueries.TopK}),
       |f AS (
       | SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank
       | FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
       |SELECT f.doc_id, f.lex_rank, f.dense_rank,
       | CAST($rrf AS BIGINT) AS rrf_score,
       | CAST(row_number() OVER (ORDER BY ($rrf) DESC, f.doc_id ASC) AS BIGINT) AS fused_rank
       |FROM f""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q139_inverted_index" ->
      s"""WITH dt AS (
         | SELECT DISTINCT doc_id, unnest(${TextQueries.wsSql}) AS term
         | FROM documents),
         |blk AS (
         | SELECT term, doc_id // $PostingBlock AS block,
         |  CAST(count(*) AS BIGINT) AS n_in_block,
         |  array_to_string(list_sort(list(doc_id)), ',') AS postings
         | FROM dt GROUP BY 1, 2),
         |dfreq AS (
         | SELECT term, CAST(sum(n_in_block) AS BIGINT) AS df
         | FROM blk GROUP BY 1 HAVING sum(n_in_block) >= $PostingMinDf)
         |SELECT b.term, CAST(b.block AS BIGINT) AS block, d.df,
         | b.n_in_block, b.postings
         |FROM blk b JOIN dfreq d ON b.term = d.term""".stripMargin,
    "q132_rrf_fusion" -> q132OracleSql,
    "q94_bm25_topk" ->
      s"""WITH $bm25CtesSql
         |SELECT doc_id, dl, n_hits, round(raw, 6) AS score
         |FROM scored WHERE n_hits > 0
         |ORDER BY round(raw, 6) DESC, doc_id ASC
         |LIMIT $TopK""".stripMargin,
    "q103_retrieval_eval" -> {
      val allPos = QueryTerms.indices.map(i => s"tfs[${i + 1}] > 0")
        .mkString(" AND ")
      s"""WITH $bm25CtesSql,
         |topk AS (
         | SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY round(raw, 6) DESC, doc_id ASC) AS BIGINT) AS rank
         | FROM scored WHERE n_hits > 0
         | ORDER BY round(raw, 6) DESC, doc_id ASC LIMIT $TopK),
         |rel AS (SELECT doc_id, ($allPos) AS is_rel FROM t),
         |h AS (
         | SELECT CAST(coalesce(sum(CASE WHEN r.is_rel THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits_topk,
         |  CAST(min(CASE WHEN r.is_rel THEN k.rank END) AS BIGINT) AS best_rank
         | FROM topk k LEFT JOIN rel r ON k.doc_id = r.doc_id),
         |ra AS (SELECT CAST(coalesce(sum(CASE WHEN is_rel THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_relevant
         |       FROM rel)
         |SELECT ra.n_relevant, h.n_hits_topk, h.best_rank,
         | round(CAST(h.n_hits_topk AS DOUBLE) / ${TopK.toDouble}, 4) AS precision_at_k,
         | CASE WHEN ra.n_relevant > 0
         |  THEN round(CAST(h.n_hits_topk AS DOUBLE) / CAST(ra.n_relevant AS DOUBLE), 4)
         | END AS recall_at_k,
         | CASE WHEN h.best_rank IS NOT NULL
         |  THEN round(1.0 / h.best_rank, 4) ELSE 0.0 END AS mrr
         |FROM h CROSS JOIN ra""".stripMargin
    },
    "q96_classifier_gate" ->
      s"""WITH docs AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
         |dw AS (SELECT DISTINCT unnest(ws) AS w FROM docs),
         |wt AS (SELECT w,
         |  ($weightsSql)[CAST(CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % $HashDim AS INTEGER) + 1] AS wgt
         | FROM dw),
         |expl AS (SELECT doc_id, unnest(ws) AS w FROM docs),
         |agg AS (
         | SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(t.wgt) AS BIGINT) AS feat_sum
         | FROM expl e JOIN wt t ON e.w = t.w GROUP BY e.doc_id)
         |SELECT d.doc_id,
         | coalesce(a.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
         | coalesce(a.feat_sum, CAST(0 AS BIGINT)) AS feat_sum,
         | round(CAST(coalesce(a.feat_sum, 0) AS DOUBLE) / 1000.0, 6) AS logit,
         | coalesce(a.feat_sum, 0) > 0 AS keep
         |FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    // q100 replays the symmetric-deletion candidate join: 0/1/2-deletion
    // variants via codepoint substr surgery, hash-join on the variant,
    // exact levenshtein verify — identical unit-cost DP on both engines
    "q100_fuzzy_join" ->
      s"""WITH vocab AS (
         | SELECT w, CAST(count(*) AS BIGINT) AS freq
         | FROM (SELECT unnest(${TextQueries.wsSql}) AS w FROM documents)
         | GROUP BY w),
         |d1 AS (
         | SELECT w, unnest(list_concat([w],
         |   list_transform(range(1, len(w) + 1),
         |     i -> substr(w, 1, CAST(i - 1 AS INTEGER))
         |       || substr(w, CAST(i + 1 AS INTEGER))))) AS v1
         | FROM vocab),
         |d2 AS (
         | SELECT w, unnest(list_concat([v1],
         |   list_transform(range(1, len(v1) + 1),
         |     i -> substr(v1, 1, CAST(i - 1 AS INTEGER))
         |       || substr(v1, CAST(i + 1 AS INTEGER))))) AS v
         | FROM d1),
         |vars AS (SELECT DISTINCT w, v FROM d2),
         |cand AS (
         | SELECT DISTINCT a.w AS word_a, b.w AS word_b
         | FROM vars a JOIN vars b ON a.v = b.v
         | WHERE a.w < b.w),
         |ver AS (
         | SELECT word_a, word_b FROM cand
         | WHERE levenshtein(word_a, word_b) <= $FuzzyMaxDist)
         |SELECT v.word_a, v.word_b,
         | CAST(levenshtein(v.word_a, v.word_b) AS BIGINT) AS dist,
         | fa.freq AS freq_a, fb.freq AS freq_b
         |FROM ver v
         |JOIN vocab fa ON v.word_a = fa.w
         |JOIN vocab fb ON v.word_b = fb.w""".stripMargin)
}
