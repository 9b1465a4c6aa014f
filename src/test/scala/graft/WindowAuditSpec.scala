package graft

import java.nio.file.{Files, Paths}

/** The unpartitioned-window audit (r10 verdict item 5). The engine's
  * `WindowExec: No Partition Defined` warnings are DELIBERATE — every
  * `Window.orderBy(...)` / `Window.partitionBy()` (empty) spec in
  * src/main runs over a bounded frame — so the test/Verify sessions
  * silence that logger. This spec is what makes the silencing safe:
  * the exact per-file site inventory is pinned here, so adding an
  * unpartitioned window ANYWHERE fails this test and forces the author
  * to (1) justify the frame's bound and (2) extend the inventory —
  * a mechanical gate instead of a WARN nobody reads.
  *
  * Bound classes, per audited site (all verified at the definition
  * sites, which carry the scale-shape scaladoc):
  *  - card-sized aggregates: language/source/histogram/value-domain
  *    frames (mixtureKeepBps, q62 quality histogram, q82 source mix,
  *    q143 length-domain CDFs, q51/q59 token budgets, q194/q195 weekly
  *    cards, q185 value histogram) — |frame| bounded by a domain, not
  *    the corpus;
  *  - dictionary-sized: q184's distinct part names;
  *  - top-k-sized: q149's final rank over ≤ FairTopK rows, ANN top-k
  *    reranks (SamplingQueries/VectorQueries rank-after-limit);
  *  - DOCUMENTED corpus-sized trade: q196's Spearman rank windows sort
  *    the documents table globally — its scaladoc names the
  *    value-histogram ranking (q185's trick) as the drop-in when the
  *    corpus outgrows a sort. The only non-card site, carried
  *    knowingly.
  */
class WindowAuditSpec extends SparkSpec {

  /** (file, expected unpartitioned-window token count). Counts both
    * `Window.orderBy(` (global ordered window) and `Window.partitionBy()`
    * (empty partition spec — global unordered window).
    */
  private val audited = Map(
    "src/main/scala/graft/queries/DedupQueries.scala" -> 1,
    "src/main/scala/graft/queries/CorpusQueries.scala" -> 7,
    "src/main/scala/graft/queries/SamplingQueries.scala" -> 1,
    "src/main/scala/graft/queries/VectorQueries.scala" -> 3,
    "src/main/scala/graft/queries/TimeseriesQueries.scala" -> 3,
    "src/main/scala/graft/queries/RelationalQueries.scala" -> 1,
    "src/main/scala/graft/queries/TextQueries.scala" -> 2
  )

  private val token = raw"Window\.orderBy\(|Window\.partitionBy\(\)".r

  test("unpartitioned windows appear only at the audited sites") {
    val srcRoot = Paths.get("src/main/scala")
    assume(Files.isDirectory(srcRoot))
    val found = {
      val it = Files.walk(srcRoot)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .map(p => p.toString ->
            token.findAllIn(Files.readString(p)).size)
          .filter(_._2 > 0)
          .toMap
      } finally it.close()
    }
    assert(found == audited,
      "unpartitioned-window inventory drifted — for every NEW site, " +
        "document the frame's bound at the definition site, then " +
        s"update the audit.\n  found:   $found\n  audited: $audited")
  }
}
