package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench artifact validity (VERDICT r13 #2): a run whose `errors` map
  * is non-empty must self-identify as incomparable even when every
  * per-query median looks green — a staging OOM leaves n_failed at 0
  * while every staged query silently degrades to its unstaged path
  * (+73 s at 100×), and a tripwire hit means the measured inputs are
  * not the baseline's. */
class BenchArtifactSpec extends AnyFunSuite {

  test("clean run is valid") {
    assert(Bench.artifactValid(0, Map.empty))
  }

  test("per-query failures invalidate") {
    assert(!Bench.artifactValid(1, Map.empty))
  }

  test("a stage error invalidates even with zero failed queries") {
    assert(!Bench.artifactValid(0,
      Map("stage_dedup" -> "STAGE_MATERIALIZATION_MULTIPLE_FAILURES")))
  }

  test("a schema-tripwire hit invalidates") {
    assert(!Bench.artifactValid(0,
      Map("schema_tripwire" -> "events.ts: INT64 (expected TIMESTAMP)")))
  }
}
