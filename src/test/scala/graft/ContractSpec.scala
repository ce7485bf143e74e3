package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself — cheap checks that prevent a
  * silent correctness-gate zero (stale oracle keys, malformed names). */
class ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracle key has a matching query") {
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracle entries without queries: $stale")
  }

  test("query names are snake_case and unique") {
    SparkEntry.queries.keys.foreach { name =>
      assert(name.matches("[a-z][a-z0-9_]*"), s"bad query name: $name")
    }
  }

  test("every correctness-gate query is oracle-checked") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // queries with no SQL-expressible oracle (qs3, non-separable KMeans)
    // are bench-only, not silent rows-only rows in the correctness gate
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  test("bench-only queries are disjoint from the oracle-checked suite") {
    val overlap = SparkEntry.benchOnlyQueries.keySet & SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"bench-only entries shadow queries: $overlap")
    SparkEntry.benchOnlyQueries.keys.foreach { name =>
      assert(name.matches("[a-z][a-z0-9_]*"), s"bad query name: $name")
    }
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
