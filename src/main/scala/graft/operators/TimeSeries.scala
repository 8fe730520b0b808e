package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O7 (SURVEY.md §2.6): time-series resample + gap fill — regularize an
  * irregular event stream onto a fixed per-key grid (here: hourly), emit
  * an explicit zero-count row for every silent bucket, and carry the last
  * observed value forward across gaps. The batch analog of what a
  * monitoring/feature pipeline does before any window model can consume
  * the series: downstream ops need a dense grid, and "no events" is a
  * signal, not an absence.
  *
  * Scale posture: the grid is built per key from that key's own
  * [min, max] hour range — `sequence` + `explode` over an already
  * partial-aggregated frame, so spine width is data-driven and never a
  * driver-side loop or a global calendar cross join. The only exchanges
  * are the keyed aggregation and the spine⋈buckets join (both on
  * (user_id, hour_id)); the forward fill is one per-key window pass with
  * `last(ignoreNulls)`. Hours are integer epoch-hour ids end to end —
  * exact on any engine, no timezone or DST arithmetic in the plan.
  */
object TimeSeries {

  /** Hourly grid + forward fill for an events-shaped frame
    * (`user_id`, `ts` timestamp, `value`).
    */
  def gapFill(events: DataFrame): DataFrame = {
    val hours = events.select(
      col("user_id"),
      expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").as("hour_id"),
      col("value"))
    val buckets = hours.groupBy(col("user_id"), col("hour_id"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum(col("value"), 2).as("hour_value"))
    val spine = buckets.groupBy(col("user_id"))
      .agg(min(col("hour_id")).as("lo"), max(col("hour_id")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("hour_id"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(buckets, Seq("user_id", "hour_id"), "left")
      .select(col("user_id"), col("hour_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("hour_value"), ignoreNulls = true).over(fill)
          .as("carried_value"))
  }

  /** O7 declared query: the dense hourly grid of the events fixture. */
  def o7GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables(spark, dir).events)
      .orderBy(col("user_id"), col("hour_id"))
}
