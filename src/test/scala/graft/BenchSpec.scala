package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Bench]]'s artifact-of-record hygiene (VERDICT r14
  * item 2). Pure decision logic — no SparkSession, so this spec costs
  * nothing in the suite.
  */
class BenchSpec extends AnyFunSuite {

  // a real (abbreviated) record line in the exact shape Bench writes:
  // compact JSON, "contaminated" with no surrounding spaces
  private def record(contaminated: Boolean): String =
    s"""{"metric":"total","value":79.489,"unit":"sec","iters":3,""" +
      s""""cold":false,"contaminated":$contaminated,"loadavg":[0.50,1.20],""" +
      s""""sf":"/root/testdata/sf0.1","queries":{"q01":0.1}}"""

  test("a contaminated sweep refuses to overwrite a clean record") {
    assert(Bench.keepExistingRecord(contaminated = true,
      existing = Some(record(contaminated = false))))
  }

  test("a clean sweep always writes — over clean, contaminated, or no record") {
    assert(!Bench.keepExistingRecord(contaminated = false,
      existing = Some(record(contaminated = false))))
    assert(!Bench.keepExistingRecord(contaminated = false,
      existing = Some(record(contaminated = true))))
    assert(!Bench.keepExistingRecord(contaminated = false, existing = None))
  }

  test("a contaminated sweep still writes when there is nothing clean to protect") {
    // no prior record at all
    assert(!Bench.keepExistingRecord(contaminated = true, existing = None))
    // prior record is itself contaminated — replacing noise with fresh
    // noise keeps the artifact current without losing clean evidence
    assert(!Bench.keepExistingRecord(contaminated = true,
      existing = Some(record(contaminated = true))))
    // prior record is unparseable garbage (truncated write, manual
    // edit) — it carries no clean-stamp claim, so it is fair to replace
    assert(!Bench.keepExistingRecord(contaminated = true,
      existing = Some("{\"met")))
  }
}
