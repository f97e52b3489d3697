package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the query registry — the contracts the
  * driver's Verify/Bench machinery depends on but nothing previously
  * asserted in one place: unique names, full oracle coverage of the
  * correctness surface, and a disjoint bench-only arm set.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered name is unique across suite and bench arms") {
    val names = SparkEntry.queries.keys.toSeq ++
      SparkEntry.benchOnlyQueries.keys.toSeq
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("every correctness-surface query carries a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"suite queries without an oracle (move to benchOnly or add SQL): $missing")
  }

  test("no oracle SQL exists for a query that is not registered") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracle SQL entries: $orphans")
  }

  test("bench arms never overlap the correctness surface") {
    val overlap =
      SparkEntry.benchOnlyQueries.keySet intersect SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"queries registered on both sides: $overlap")
  }

  test("the registry is at its committed size (catches silent drops)") {
    assert(SparkEntry.queries.size === 167,
      s"oracle surface moved: ${SparkEntry.queries.size} (update the docs!)")
    assert(SparkEntry.benchOnlyQueries.size === 21,
      s"bench arms moved: ${SparkEntry.benchOnlyQueries.size}")
  }
}
