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

  test("rows-only queries are the documented hash-seeded/approx/stub set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // qs3 (non-separable KMeans) is the single remaining rows-only query;
    // its separable twin qs11 and the multimodal features (qm1/qm2) are
    // oracle-checked since round 3
    assert(rowsOnly == Set("qs3_palette_by_source"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
