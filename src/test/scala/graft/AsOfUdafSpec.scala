package graft

import graft.functions.WeightedAvg
import graft.operators.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J7 as-of join cross-checked against an independent naive
  * implementation, and the A7 UDAF against its expression twin.
  */
class AsOfUdafSpec extends SparkSuite {

  test("J7 as-of (window impl) == naive range-join + row_number impl") {
    val fast = AsOf.j7AsOf(spark, sf)
    // independent oracle: O(matches) range join, keep latest click per purchase
    val ev = tables.eventsRaw.withColumn("ts_us", expr("ts DIV 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("click_ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us").as("purchase_ts_us"))
    val w = Window.partitionBy(col("purchase_id")).orderBy(col("click_ts_us").desc)
    val naive = purchases
      .join(clicks, col("user_id") === col("c_user") && col("click_ts_us") <= col("purchase_ts_us"), "left_outer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("purchase_id"), col("purchase_ts_us"),
        col("click_ts_us"), (col("purchase_ts_us") - col("click_ts_us")).as("gap_us"))
    assertSameRows(fast, naive)
  }

  test("A7 UDAF == aggregate-expression twin (same exact HALF_UP rounding)") {
    val udafResult = WeightedAvg.a7WeightedAvg(spark, sf)
    // twin mirrors finish(): floor((2·S1·10⁴ + S2) / (2·S2)) / 10⁴
    val s1 = sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(30,12)"))
    val s2 = sum(col("l_quantity").cast("decimal(30,12)"))
    val twin = tables.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        (call_function("div",
          (s1 * lit(20000L)).cast("decimal(38,0)") + (s2 * lit(1L)).cast("decimal(38,0)"),
          (s2 * lit(2L)).cast("decimal(38,0)")).cast("double") / lit(1e4)).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    assertSameRows(udafResult, twin)
  }
}
