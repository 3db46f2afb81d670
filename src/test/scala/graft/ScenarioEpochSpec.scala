package graft

import graft.queries.Scenarios

/** The scenario EPOCH seam the bench's memoized-entry retry rides
  * ([[Scenarios.withFreshScenarios]]): inside the scope every memoized
  * scenario lookup must rebuild into a FRESH destination (a retry times
  * the engine, not a cache read); outside, the default epoch's cached
  * destinations must be untouched. */
class ScenarioEpochSpec extends SparkSuite {

  test("withFreshScenarios rebuilds; the default epoch cache survives") {
    val dir = "/root/testdata/sf0.001"
    val d0 = Scenarios.deltaDest(spark, dir)
    // cached: second lookup in the same epoch is the SAME destination
    assert(Scenarios.deltaDest(spark, dir) == d0)
    val dFresh = Scenarios.withFreshScenarios {
      Scenarios.deltaDest(spark, dir)
    }
    assert(dFresh != d0, "fresh epoch must rebuild into a new destination")
    // the rebuild is a REAL scenario (same content, different dir)
    assert(Scenarios.history(spark, dFresh).count() ==
      Scenarios.history(spark, d0).count())
    // default epoch untouched after the scope exits
    assert(Scenarios.deltaDest(spark, dir) == d0)
    // two fresh scopes never share a destination (each epoch is unique)
    val dFresh2 = Scenarios.withFreshScenarios(Scenarios.deltaDest(spark, dir))
    assert(dFresh2 != dFresh && dFresh2 != d0)
  }
}
