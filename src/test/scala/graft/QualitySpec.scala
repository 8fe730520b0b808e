package graft

import graft.operators.Quality
import graft.operators.Quality.ScanRule
import org.apache.spark.sql.functions._

/** S9 constraint-audit semantics: injected violations are counted
  * exactly; the fixture warehouse passes its declared expectations.
  */
class QualitySpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("S9: injected violations counted exactly, one fold pass per table") {
    val df = Seq(
      (1L, Some("O"), 10.0),   // clean
      (2L, Some("X"), -5.0),   // bad status AND non-positive price
      (3L, None, 0.0),         // null status, non-positive price
      (4L, Some("F"), 2.5))    // clean
      .toDF("id", "status", "price")
    val rules = Seq(
      ScanRule("t", "status_in_domain",
        !col("status").isin("O", "F", "P")),
      ScanRule("t", "price_positive", col("price") <= 0.0))
    val got = Quality.evalScanRules(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // NULL violation predicates don't count (isin(null) is null, not true)
    // — a null status is the business of an explicit not-null rule
    assert(got == Map("status_in_domain" -> 1L, "price_positive" -> 2L))
  }

  test("S9 fixture audit: every declared rule reports, warehouse is clean") {
    val rows = Quality.s9Constraints(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == Quality.scanRules.size + 3) // + unique + 2 FKs
    // the generated fixture satisfies its own contract: keys unique,
    // FKs closed, domains respected
    rows.foreach { case (rule, n) => assert(n == 0L, s"$rule: $n violations") }
  }
}
