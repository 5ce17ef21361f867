package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the correctness gate only checks
  * queries that DECLARE an oracle, so a typo'd registry key or a forgotten
  * oracle entry would silently weaken the gate rather than fail it.
  */
class SparkEntryContractSpec extends AnyFunSuite {

  test("every gated query has an oracle — the rows-only set is empty") {
    // q45 was the last rows-only row; since round 8 it gates its sketches
    // via their error-bound guarantees (q121/q147 pattern), so EVERY
    // registered query now has a full hash-match oracle.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (add SQL or document rows-only): $missing")
  }

  test("no orphan oracles (oracle keys must name registered queries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles with no query: $orphans")
  }

  test("query keys follow the qNN_name convention and are unique per number") {
    val keys = SparkEntry.queries.keySet.filter(_.startsWith("q"))
    val nums = keys.toSeq.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct)}")
    assert(keys.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), keys.toSeq.sorted.mkString(","))
  }
}
