package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.SparkPlan

/** Dev probe for the generalized q113 failure mode (VERDICT r17
  * item 4): a NON-CHEAP expression referenced by 2+ output columns of
  * ONE projection is re-evaluated per column — codegen subexpression
  * elimination was measured NOT to deduplicate the repeated custom
  * expression there (q113 solo 9.96 → 6.03 task-s on an alias-split
  * alone). This scans every declared query's EXECUTED plan: for each
  * Project / HashAggregate-like node, canonicalize every expensive
  * subtree per output column and report any subtree that appears under
  * two or more distinct output columns.
  *
  * Usage: `Test/runMain graft.ExprAuditProbe <sfDir>` (or
  * scripts/run_main.sh). Prints one line per hit:
  * `HIT <query> <node> <n_cols> <expr>` and a final summary.
  */
object ExprAuditProbe {

  /** Expensive = worth never evaluating twice: custom graft
    * expressions, regex engines, cryptographic digests, per-element
    * array walks, interpreted lambda higher-order functions, JSON
    * parsing. Cheap arithmetic/casts/comparisons are excluded — the
    * audit is for the q113 class, not micro-CSE.
    */
  private def expensive(e: Expression): Boolean = e match {
    case _: graft.expressions.SortedStringIntersectSize => true
    case _: RegExpExtract | _: RegExpReplace | _: RLike => true
    case _: StringSplit | _: Sentences => true
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 => true
    case _: ArrayIntersect | _: ArrayUnion | _: ArrayExcept => true
    case _: ArrayDistinct | _: SortArray | _: ArraysOverlap => true
    case _: ArrayContains | _: ArraysZip => false // cheap probes
    case _: HigherOrderFunction => true // interpreted lambda per element
    case _: JsonToStructs | _: GetJsonObject | _: JsonTuple => true
    case _: ScalaUDF => true
    case e if e.getClass.getName.startsWith("graft.expressions.") => true
    case _ => false
  }

  /** All expensive subtrees of one output column, canonicalized. */
  private def expensiveSubtrees(root: Expression): Set[Expression] = {
    val out = scala.collection.mutable.Set.empty[Expression]
    root.foreach { e => if (expensive(e)) out += e.canonicalized }
    out.toSet
  }

  private def auditNode(query: String, node: String,
                        outputs: Seq[Expression],
                        hits: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val perColumn = outputs.map(expensiveSubtrees)
    val counts = scala.collection.mutable.Map.empty[Expression, Int]
    perColumn.foreach(_.foreach(e => counts(e) = counts.getOrElse(e, 0) + 1))
    counts.foreach { case (e, n) =>
      if (n >= 2) {
        val s = e.toString.take(160)
        hits += s"HIT $query $node $n $s"
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    LogHygiene.quietKnownWarnings()
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    var scanned = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan: SparkPlan = fn(spark, sfDir).queryExecution.executedPlan
        plan.foreach {
          case p: org.apache.spark.sql.execution.ProjectExec =>
            auditNode(name, "Project", p.projectList, hits)
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
            auditNode(name, "HashAggregate",
              a.aggregateExpressions.flatMap(_.aggregateFunction.children) ++
                a.resultExpressions, hits)
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
            auditNode(name, "ObjectHashAggregate",
              a.aggregateExpressions.flatMap(_.aggregateFunction.children) ++
                a.resultExpressions, hits)
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
            auditNode(name, "SortAggregate",
              a.aggregateExpressions.flatMap(_.aggregateFunction.children) ++
                a.resultExpressions, hits)
          case f: org.apache.spark.sql.execution.FilterExec =>
            // a filter + sibling projection duplicating the same
            // expensive tree is the 4.4-style double-eval shape
            auditNode(name, "Filter", Seq(f.condition), hits)
          case _ => ()
        }
        scanned += 1
      } catch {
        case e: Throwable =>
          println(s"SKIP $name: plan failed: ${e.getClass.getSimpleName}")
      }
    }
    hits.foreach(println)
    println(s"AUDIT DONE: $scanned queries scanned, ${hits.size} hits")
    spark.stop()
  }
}
