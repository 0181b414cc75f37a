package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guards for the per-family entry split (r14): the aggregate
  * maps in [[ExtendedEntries]] are `++` unions, so a query key accidentally
  * registered in two family objects would silently LAST-WIN — one family's
  * implementation (or oracle) would shadow the other with no error
  * anywhere. These asserts make that a loud test failure instead. */
class EntrySplitSpec extends AnyFunSuite {

  private val queryFamilies = Seq(
    "AnnEntries" -> AnnEntries.queries.keySet,
    "MediaEntries" -> MediaEntries.queries.keySet,
    "TextDedupEntries" -> TextDedupEntries.queries.keySet,
    "GraphEntries" -> GraphEntries.queries.keySet,
    "StreamEntries" -> StreamEntries.queries.keySet,
    "RelationalEntries" -> RelationalEntries.queries.keySet)

  private val oracleFamilies = Seq(
    "AnnEntries" -> AnnEntries.oracleSql.keySet,
    "MediaEntries" -> MediaEntries.oracleSql.keySet,
    "TextDedupEntries" -> TextDedupEntries.oracleSql.keySet,
    "GraphEntries" -> GraphEntries.oracleSql.keySet,
    "StreamEntries" -> StreamEntries.oracleSql.keySet,
    "RelationalEntries" -> RelationalEntries.oracleSql.keySet)

  private def assertDisjoint(fams: Seq[(String, Set[String])]): Unit =
    for {
      Seq((na, a), (nb, b)) <- fams.combinations(2)
      overlap = a.intersect(b)
    } assert(overlap.isEmpty, s"$na and $nb both register: $overlap")

  test("family query maps are pairwise disjoint (no silent shadowing)") {
    assertDisjoint(queryFamilies)
    assert(ExtendedEntries.queries.size == queryFamilies.map(_._2.size).sum)
  }

  test("family oracle maps are pairwise disjoint (no silent shadowing)") {
    assertDisjoint(oracleFamilies)
    assert(ExtendedEntries.oracleSql.size == oracleFamilies.map(_._2.size).sum)
  }

  test("every family oracle key has a query (and the registry stays aligned)") {
    val q = ExtendedEntries.queries.keySet
    val o = ExtendedEntries.oracleSql.keySet
    val orphans = o.diff(q)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    // and the driver-facing union (SparkEntry) must cover both
    assert(o.subsetOf(SparkEntry.oracleSql.keySet))
    assert(q.subsetOf(SparkEntry.queries.keySet))
  }
}
