package graft

import graft.Materialize.Ops

import org.apache.spark.sql.functions._

/** Scratch breakdown of q58's warm-path cost (test scope): times the
  * candidate stage and the decision stage separately, plus the
  * fingerprint lookup that sits on the memo-key path.
  */
object Q58Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create("32")
    import graft.queries.DedupQueries
    // warm the signatures memo + codegen
    DedupQueries.q58(spark, dir).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val fp = graft.sources.DatasetFingerprint.ofTable(spark, dir, "documents")
      val tFp = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
      val inc = docs.filter(col("source").isin(DedupQueries.IncomingSources: _*))
        .select(col("doc_id"))
      val cand = DedupQueries.lshCandidatesSeeded(
          DedupQueries.checkpointedSignatures(spark, dir), inc)
        .join(docs.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
        .withColumn("a_inc", col("src_a").isin(DedupQueries.IncomingSources: _*))
        .withColumn("b_inc", col("src_b").isin(DedupQueries.IncomingSources: _*))
        .materialize()
      val tCand = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      DedupQueries.decisionFromCandidates(inc, cand)
        .write.format("noop").mode("overwrite").save()
      val tDec = (System.nanoTime() - t0) / 1e9
      println(f"[q58probe] iter $i fp=$tFp%.3f cand=$tCand%.3f decide=$tDec%.3f (fp=$fp)")
    }
    spark.stop()
  }
}
