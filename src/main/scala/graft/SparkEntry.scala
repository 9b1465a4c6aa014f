package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator-coverage surface (one entry per
  * SURVEY.md §2 inventory row plus the beyond-reference corpus
  * operators, tags in each query's scaladoc); `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare gate. EVERY query has an
  * oracle (ContractSpec enforces the 1:1 pairing): engine-specific
  * hash constants are Scala values interpolated into both sides, and
  * the one sketch query gates on its exact column plus an error-bound
  * boolean.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way FK-chain join + aggregation (§2.3 J1) — the reference's
    * core export shape (`packagers/siri.py:51-66`).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.q06(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.TimeseriesQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.SamplingQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.SearchQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.TimeseriesQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.SamplingQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.SearchQueries.oracles
}
