package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J7 (SURVEY.md §2.3): as-of join — align each right-stream row with the
  * nearest earlier left-stream row per key.
  *
  * Implementation is the scale-safe single-shuffle form: tag both inputs,
  * UNION them, and carry the left value forward with
  * `last(_, ignoreNulls)` over a (key, time)-ordered window — one shuffle
  * on the key, sort within partitions, no range-join row explosion. (The
  * naive range-join + row_number form is O(matches) intermediate rows;
  * the scalatest suite cross-checks this implementation against it.)
  */
object AsOf {

  /** Generic as-of: for every row of `right`, the latest `left` row with
    * `left.timeCol <= right.timeCol` and equal `key`. `valueCols` of the
    * left side are carried; right rows with no earlier left row keep
    * nulls (LEFT ASOF semantics).
    *
    * Tie discipline: rows are ordered by (time, tieBreak); a left row at
    * exactly the right row's time counts as "earlier or equal", matching
    * SQL ASOF JOIN's `>=` bound.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, timeCol: String,
               tieBreak: String, leftValue: String): DataFrame = {
    val l = left.select(col(key), col(timeCol), col(tieBreak),
      lit(1).as("__is_left"), col(leftValue).as("__lv"))
    val r = right.select(col(key), col(timeCol), col(tieBreak),
      lit(0).as("__is_left"), lit(null).cast(l.schema("__lv").dataType).as("__lv"))
    // Left rows sort before right rows at equal time (__is_left desc) so
    // an equal-time left value is visible to the right row.
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col("__is_left").desc, col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__asof", last(col("__lv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 0)
      .drop("__is_left", "__lv")
  }

  /** J7 declared query: for every purchase event, the timestamp of the
    * user's nearest earlier (or simultaneous) click, plus the gap.
    * Times are compared at microsecond precision on both engines (DuckDB
    * reads the ns-parquet truncated to µs TIMESTAMP; Spark truncates the
    * raw int64 nanos identically with integer DIV).
    */
  def j7AsOf(spark: SparkSession, dir: String): DataFrame = {
    // The generic asOfJoin unions two CALLER frames — fine when left and
    // right really are different sources, but here both sides are filters
    // of the SAME events scan, and Spark plans a union of two frames as
    // two parquet scans. Building the tagged union from one filtered scan
    // directly (`event_type IN (click, purchase)` pushed to the reader,
    // __is_left = is-click) halves the input I/O and produces exactly the
    // row set asOfJoin's union would; the window/fill logic is unchanged.
    val ev = Tables(spark, dir).eventsRaw
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_id"),
        (col("event_type") === "click").as("__l"))
    val tagged = ev.select(col("user_id"), col("ts_us"), col("event_id"),
      col("__l").cast("int").as("__is_left"),
      when(col("__l"), col("ts_us")).as("__lv"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("__is_left").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("__asof", last(col("__lv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 0)
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"),
        col("__asof").as("click_ts_us"),
        (col("ts_us") - col("__asof")).as("gap_us"))
      .orderBy(col("user_id"), col("purchase_id"))
  }
}
