package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Bench]]'s artifact-of-record hygiene (VERDICT r14
  * item 2; mid-sweep stamp + sf-match r15 item 1 / r15 ADVICE). Pure
  * decision logic — no SparkSession, so this spec costs nothing in
  * the suite.
  */
class BenchSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.1"

  // a real (abbreviated) record line in the exact shape Bench writes:
  // compact JSON, "contaminated"/"sf" with no surrounding spaces
  private def record(contaminated: Boolean, sf: String = Sf): String =
    s"""{"metric":"total","value":79.489,"unit":"sec","iters":3,""" +
      s""""cold":false,"contaminated":$contaminated,"loadavg":[0.50,1.20],""" +
      s""""ext_load":0.05,"sf":"$sf","queries":{"q01":0.1}}"""

  test("a contaminated sweep refuses to overwrite a clean record") {
    assert(Bench.keepExistingRecord(contaminated = true, sf = Sf,
      existing = Some(record(contaminated = false))))
  }

  test("a clean sweep always writes — over clean, contaminated, or no record") {
    assert(!Bench.keepExistingRecord(contaminated = false, sf = Sf,
      existing = Some(record(contaminated = false))))
    assert(!Bench.keepExistingRecord(contaminated = false, sf = Sf,
      existing = Some(record(contaminated = true))))
    assert(!Bench.keepExistingRecord(contaminated = false, sf = Sf,
      existing = None))
  }

  test("a contaminated sweep still writes when there is nothing clean to protect") {
    // no prior record at all
    assert(!Bench.keepExistingRecord(contaminated = true, sf = Sf,
      existing = None))
    // prior record is itself contaminated — replacing noise with fresh
    // noise keeps the artifact current without losing clean evidence
    assert(!Bench.keepExistingRecord(contaminated = true, sf = Sf,
      existing = Some(record(contaminated = true))))
    // prior record is unparseable garbage (truncated write, manual
    // edit) — it carries no clean-stamp claim, so it is fair to replace
    assert(!Bench.keepExistingRecord(contaminated = true, sf = Sf,
      existing = Some("{\"met")))
  }

  test("a clean record for a DIFFERENT lake does not block the overwrite") {
    // r15 ADVICE: refusing here would leave BENCH_RESULT.json
    // describing the wrong dataset — a clean sf0.1 record is not
    // better evidence for an sf0.5 sweep
    assert(!Bench.keepExistingRecord(contaminated = true,
      sf = "/tmp/sf0.5-r14",
      existing = Some(record(contaminated = false, sf = Sf))))
  }

  test("mid-sweep co-tenant burn contaminates a quiet-start sweep (r15 item 1)") {
    // the r15 driver-sweep shape: started at 0.74 (below the 1.5
    // gate) but a co-tenant burned multiple external cores mid-sweep
    assert(Bench.contaminatedStamp(loadStart = 0.74, extLoad = 2.5))
    // the measured r16 burst window (ext_load 0.96 — hypervisor
    // steal; task times read 1.8× inflated there, so it must stamp)
    assert(Bench.contaminatedStamp(loadStart = 0.97, extLoad = 0.96))
    // loaded start still contaminates regardless of external burn
    assert(Bench.contaminatedStamp(loadStart = 2.06, extLoad = 0.0))
    // quiet start + only daemon-level background burn = clean: the
    // committed clean 62.9 s record's own END loadavg was 2.25 (its
    // own 32 threads) — self-load must never contaminate the stamp
    assert(!Bench.contaminatedStamp(loadStart = 0.76, extLoad = 0.08))
  }

  test("only the record lake AT the record core count routes to " +
    "BENCH_RESULT.json (r16 item 1 + r17 item 1)") {
    assert(Bench.recordArtifactPath(Sf, "32") == "BENCH_RESULT.json")
    // aliased spellings of the record lake still route to the record:
    // trailing slash, dot segments (r16 ADVICE — byte-equality on the
    // raw path defeated the clean-record protection)
    assert(Bench.recordArtifactPath(Sf + "/", "32") == "BENCH_RESULT.json")
    assert(Bench.recordArtifactPath("/root/testdata/./sf0.1", "32") ==
      "BENCH_RESULT.json")
    assert(Bench.recordArtifactPath("/root/testdata/../testdata/sf0.1", "32") ==
      "BENCH_RESULT.json")
    // replica lakes write their own slugged file — never the record,
    // even when they share a basename across parents
    assert(Bench.recordArtifactPath("/tmp/sf1-r14", "32") ==
      "bench_profile_tmp-sf1-r14.json")
    assert(Bench.recordArtifactPath("/tmp/sf0.5-r14", "32") !=
      Bench.recordArtifactPath("/var/sf0.5-r14", "32"))
    assert(!Bench.recordArtifactPath("/tmp/sf0.5-r14", "32")
      .contains("BENCH_RESULT"))
    // r17 item 1: the driver's clean 8-core scaling sweep of the
    // RECORD LAKE overwrote the clean 32-core record — a non-record
    // core count now routes to its own file, record lake or not
    assert(Bench.recordArtifactPath(Sf, "8") ==
      "bench_profile_record_c8.json")
    assert(!Bench.recordArtifactPath(Sf, "8").contains("BENCH_RESULT"))
    assert(Bench.recordArtifactPath(Sf, "8") !=
      Bench.recordArtifactPath(Sf, "16"))
    assert(Bench.recordArtifactPath("/tmp/sf1-r14", "8") ==
      "bench_profile_tmp-sf1-r14_c8.json")
    // a hostile/odd cpus string cannot escape the filename (slugged)
    assert(Bench.recordArtifactPath(Sf, "../8") ==
      "bench_profile_record_c---8.json")
  }

  test("normalizeLake canonicalizes aliases of the same directory") {
    val base = Bench.normalizeLake("/tmp")
    assert(Bench.normalizeLake("/tmp/") == base)
    assert(Bench.normalizeLake("/tmp/x/..") == base)
    // nonexistent paths still normalize (no symlink resolution, but
    // absolute + dot-free) instead of throwing
    assert(Bench.normalizeLake("/no/such/dir/") == "/no/such/dir")
  }

  test("externalLoad subtracts self jiffies and never goes negative or NaN") {
    // 60 s window, host burned 9000 jiffies (90 cpu-s at HZ=100), we
    // burned 6000 of them → 30 external cpu-s / 60 s = 0.5 cores
    assert(math.abs(Bench.externalLoad(
      Some((100000L, 50000L)), Some((109000L, 56000L)), 60.0) - 0.5) < 1e-9)
    // accounting jitter (self > host delta) clamps to 0, not negative
    assert(Bench.externalLoad(
      Some((100L, 50L)), Some((110L, 70L)), 10.0) == 0.0)
    // a failed snapshot (non-Linux /proc) never contaminates
    assert(Bench.externalLoad(None, Some((1L, 1L)), 10.0) == 0.0)
    assert(Bench.externalLoad(Some((1L, 1L)), None, 10.0) == 0.0)
    // degenerate window
    assert(Bench.externalLoad(Some((1L, 1L)), Some((2L, 1L)), 0.0) == 0.0)
  }

  test("stealLoad averages steal jiffies over the window and is inert " +
    "on missing evidence (the SCALE.md §34 regime-diagnosis field)") {
    // 60 s window, 3000 steal jiffies (30 stolen cpu-s) → 0.5 cores
    assert(math.abs(Bench.stealLoad(
      Some(200000L), Some(203000L), 60.0) - 0.5) < 1e-9)
    // counter monotonicity jitter clamps to 0
    assert(Bench.stealLoad(Some(100L), Some(90L), 10.0) == 0.0)
    // failed snapshots and degenerate windows read 0
    assert(Bench.stealLoad(None, Some(1L), 10.0) == 0.0)
    assert(Bench.stealLoad(Some(1L), None, 10.0) == 0.0)
    assert(Bench.stealLoad(Some(1L), Some(2L), 0.0) == 0.0)
  }
}
