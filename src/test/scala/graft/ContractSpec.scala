package graft

/** Guards on the driver contract itself: the oracle map must reference
  * only registered queries (a typo'd key silently drops a correctness
  * check), the intentionally-oracle-less set is explicit, and the
  * flagship entry returns rows (the driver's t1 smoke).
  */
class ContractSpec extends SparkSpec {

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every registered query has an oracle (no rows-only gate rows)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected oracle-less queries: $rowsOnly")
  }

  test("query names are unique across modules (no silent map overwrite)") {
    val all = Seq(
      graft.queries.RelationalQueries.queries, graft.queries.TimeseriesQueries.queries,
      graft.queries.DedupQueries.queries, graft.queries.TextQueries.queries,
      graft.queries.VectorQueries.queries, graft.queries.MultimodalQueries.queries,
      graft.queries.SamplingQueries.queries, graft.queries.CorpusQueries.queries,
      graft.queries.SearchQueries.queries)
    assert(all.map(_.size).sum == SparkEntry.queries.size)
  }

  test("flagship entry returns rows on the smoke lake") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
