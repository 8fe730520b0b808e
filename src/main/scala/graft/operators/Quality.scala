package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: declarative data-quality constraint audit — the rule-evaluation
  * pass (dbt-test / Deequ style) a production pipeline runs on every load:
  * primary-key uniqueness, referential integrity, null contracts, value
  * ranges, enum domains. Complements the S7 profiler: the profiler
  * DESCRIBES a table, the audit JUDGES it against declared expectations
  * and reports violation counts per rule.
  *
  * Scale shape: each rule is either one partial-aggregated scan
  * (null/range/enum counts fold into a single conditional-sum pass per
  * table — never a scan per rule) or one key-keyed anti-join (referential
  * integrity, broadcast when the parent side is dimension-sized). Output
  * is #rules rows regardless of input size. All counts are exact
  * integers — trivially engine-independent.
  */
object Quality {

  /** One named check: `rule` label + a violation predicate evaluated as a
    * conditional count over a table scan.
    */
  final case class ScanRule(table: String, rule: String, violation: Column)

  /** The declared expectation set for the fixture warehouse. Scan rules
    * fold per table; FK rules run as anti-joins (below).
    */
  def scanRules: Seq[ScanRule] = Seq(
    ScanRule("orders", "orders_custkey_not_null", col("o_custkey").isNull),
    ScanRule("orders", "orders_status_in_domain",
      !col("o_orderstatus").isin("O", "F", "P")),
    ScanRule("orders", "orders_totalprice_positive", col("o_totalprice") <= 0.0),
    ScanRule("lineitem", "lineitem_quantity_in_range",
      col("l_quantity") <= 0.0 || col("l_quantity") > 100.0),
    ScanRule("lineitem", "lineitem_discount_in_range",
      col("l_discount") < 0.0 || col("l_discount") > 1.0),
    ScanRule("events", "events_type_in_domain",
      !col("event_type").isin("view", "click", "purchase", "signup", "error")),
    ScanRule("documents", "documents_text_not_empty",
      col("text").isNull || length(col("text")) === 0))

  /** Evaluate a table's scan rules in ONE aggregate pass (a conditional
    * sum per rule), exploded to a (rule, n_violations) row each.
    */
  def evalScanRules(df: DataFrame, rules: Seq[ScanRule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.rule))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map(r =>
        struct(lit(r.rule).as("rule"), col(r.rule).as("n_violations"))): _*))
        .as("s"))
      .select(col("s.rule"), col("s.n_violations"))
  }

  /** S9 declared query: evaluate every expectation, one row per rule —
    * (rule, n_violations). Scan rules group into ONE conditional-sum
    * aggregate per table; uniqueness is count(*) − count(distinct key);
    * referential integrity is a left-anti join against the parent key set
    * (broadcast under the session threshold — parents here are dims).
    */
  def s9Constraints(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def tbl(name: String): DataFrame = name match {
      case "orders" => t.orders; case "lineitem" => t.lineitem
      case "events" => t.events; case "documents" => t.documents
      case other => sys.error(
        s"no table mapping for rule table '$other' — add it to s9Constraints.tbl")
    }
    // all scan rules of one table fold into a single aggregate pass
    val scans = scanRules.groupBy(_.table).toSeq.map { case (table, rules) =>
      evalScanRules(tbl(table), rules)
    }
    val pkUnique = t.orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
      .select(lit("orders_orderkey_unique").as("rule"), col("n_violations"))
    // FK violation = NON-NULL key with no parent (a null key is the
    // not-null rule's business; left_anti would otherwise keep null
    // children). The oracle twin uses NOT EXISTS, not NOT IN — a NULL
    // in the PARENT key column makes NOT IN return zero rows while the
    // anti-join still counts true orphans; NOT EXISTS matches left_anti
    // exactly under any null pattern on either side.
    val fkOrders = t.orders.filter(col("o_custkey").isNotNull)
      .join(Relational.broadcastIfSmall(t.customer),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_custkey_fk_customer").as("rule"), col("n_violations"))
    val fkLineitem = t.lineitem.filter(col("l_orderkey").isNotNull)
      .join(Relational.broadcastIfSmall(t.orders),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_orderkey_fk_orders").as("rule"), col("n_violations"))
    (scans :+ pkUnique :+ fkOrders :+ fkLineitem)
      .reduce(_ unionByName _)
      .orderBy(col("rule"))
  }
}
