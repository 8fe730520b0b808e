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
    *
    * JOIN-FREE: the r16 form built the per-user spine separately
    * (min/max agg + sequence explode), left-joined the buckets back
    * (which forced a persist — two consumers of the same aggregate — and
    * a broadcast build of the full bucket frame) and ran the forward
    * fill over the DENSE grid. But every dense row's value is decided by
    * the bucket that OPENS its gap, so each bucket row can emit its own
    * gap directly: one window pass over the (sparse) bucket rows
    * computes the carried value (`last ignoreNulls` — an all-null bucket
    * carries the earlier value exactly like the dense-window form) and
    * the gap end (`lead − 1`, own hour for the last bucket), then a
    * `sequence` explode densifies. Bucket rows emit (n_events, value);
    * the synthesized silent hours emit (0, carried). Same grid by
    * construction: per user, ⋃ [bucket_i, bucket_{i+1} − 1] plus the
    * final bucket = [min, max]. Plan: persist + spine aggregate +
    * broadcast join GONE — scan → one keyed aggregation → one window →
    * explode; the fill window now sorts the sparse bucket rows, not the
    * dense grid. The join form is kept as [[gapFillJoinForm]]; the spec
    * pins the two row-for-row.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val hours = events.select(
      col("user_id"),
      expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").as("hour_id"),
      col("value"))
    val buckets = hours.groupBy(col("user_id"), col("hour_id"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum(col("value"), 2).as("hour_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_id"))
    // keyed fan-out floor: the sequence explode below multiplies rows
    // ~10× and would otherwise run in the ONE partition AQE coalesces
    // this small keyed exchange to (see Engine.fanoutFloorBy — no-op at
    // scale, and the window reuses the pinned exchange)
    graft.Engine.fanoutFloorBy(buckets, col("user_id"))
      .withColumn("carried",
        last(col("hour_value"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap_end",
        coalesce(lead(col("hour_id"), 1).over(w) - 1, col("hour_id")))
      .select(col("user_id"), col("hour_id").as("bucket_hour"),
        col("n_events").as("bucket_n"), col("carried"),
        explode(sequence(col("hour_id"), col("gap_end"))).as("hour_id"))
      .select(col("user_id"), col("hour_id"),
        when(col("hour_id") === col("bucket_hour"), col("bucket_n"))
          .otherwise(lit(0L)).as("n_events"),
        col("carried").as("carried_value"))
  }

  /** The r16 spine-join form of [[gapFill]] — kept as the equivalence
    * witness (RelationalSpec pins the two row-for-row).
    */
  private[graft] def gapFillJoinForm(events: DataFrame): DataFrame = {
    val hours = events.select(
      col("user_id"),
      expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").as("hour_id"),
      col("value"))
    val buckets = hours.groupBy(col("user_id"), col("hour_id"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum(col("value"), 2).as("hour_value"))
      .persist()
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

  /** O8: SCD Type-2 interval build — turn a change log (key, ts, value)
    * into versioned dimension rows [valid_from, valid_to) with consecutive
    * same-value observations collapsed into one interval. The other half
    * of the CDC story next to `o6_upsert` (latest-wins snapshot): upsert
    * answers "what is current", SCD2 answers "what was true when", which
    * is what a point-in-time feature join needs.
    *
    * Island compression then interval close, both per-key window passes:
    * (1) keep a row iff its tracked value differs from the previous
    * observation (`lag`), (2) `lead` the surviving change times into
    * `valid_to` (null = still current). Scale posture: two narrow window
    * passes over key-partitioned data — no self-join, no state beyond one
    * row per key; skew bounded by a single key's history length.
    *
    * Tracked attribute here: the events fixture's `event_type` per user —
    * any (key, ordered-version, attribute) triple works the same.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, tieBreakCols: Seq[String] = Nil): DataFrame = {
    // the per-key order must be TOTAL or lag/lead pick a physical row
    // order: callers either guarantee one observation per (key, ts) —
    // both in-repo callers pre-collapse via min_by — or pass tie-breaks
    val order = (tsCol +: tieBreakCols).map(col)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    changes
      .withColumn("__prev", lag(col(valueCol), 1).over(byKey))
      // first observation (prev null) always opens an interval; a null
      // tracked value is a real state, so compare null-safely
      .filter(!(col(valueCol) <=> col("__prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** J11 declared query: point-in-time (PIT) read against the SCD2
    * dimension — the feature-store join: for every purchase, the user's
    * activity state (last non-purchase event_type) VALID AT purchase
    * time. Composition of [[scd2]] (dimension build from the non-purchase
    * change log) and [[AsOf.asOfJoin]] on the interval STARTS: because
    * SCD2 intervals tile each key's timeline, "the interval containing t"
    * IS "the greatest valid_from ≤ t" — no range join, no interval
    * explosion, one shuffle via the as-of union-window form. A state
    * opening exactly at the purchase's microsecond wins (ASOF ≥ bound),
    * matching DuckDB ASOF JOIN.
    */
  def j11Pit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).eventsRaw.withColumn("ts_us", expr("ts DIV 1000"))
    val changes = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val oneUs = changes.groupBy(col("user_id"), col("ts_us"))
      .agg(min_by(col("event_type"), col("event_id")).as("event_type"))
    val dim = scd2(oneUs, "user_id", "ts_us", "event_type")
      .select(col("user_id"), col("valid_from").as("ts_us"),
        // valid_from is unique per user (scd2 input is one row per
        // microsecond) — the tie-break never fires on the left side
        lit(-1L).as("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    AsOf.asOfJoin(dim, purchases, key = "user_id", timeCol = "ts_us",
        tieBreak = "event_id", leftValue = "event_type")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"), col("__asof").as("state"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** O8 declared query: SCD2 intervals of each user's event_type history.
    * Times as integer epoch micros; ties within a microsecond broken by
    * event_id via a pre-pass min so the change sequence is total.
    */
  def o8Scd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
    // totalize the per-user order: if two events share a microsecond keep
    // the lowest event_id as that instant's observation
    val oneUs = ev.groupBy(col("user_id"), col("us"))
      .agg(min_by(col("event_type"), col("event_id")).as("event_type"))
    scd2(oneUs, "user_id", "us", "event_type")
      .select(col("user_id"), col("event_type"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Day length in epoch micros and busy-window count for [[j12IntervalJoin]]. */
  val DayUs = 86400000000L
  val BusyDays = 5

  /** J12: KEYLESS interval-overlap join — which user-state intervals (the
    * SCD2 history) overlap the corpus's [[BusyDays]] busiest days, with
    * the overlap duration. The temporal-join shape j5 (point-in-range)
    * and j11 (point-in-time) don't cover: interval × interval overlap
    * with NO equi key to hash on.
    *
    * Scale strategy: never a theta join (every-pair comparison is a
    * cartesian at 100 TB). Each interval EXPLODES into the day buckets it
    * spans — the factor is bounded by the data's time horizon over the
    * bucket width, and a longer horizon just wants a coarser bucket — and
    * the overlap becomes an EQUI join on the bucket id. Because the busy
    * windows are bucket-aligned, bucket equality is exactly overlap (no
    * post-dedup needed: one output row per (interval, day) pair IS the
    * contract). The busy side is a k-row TakeOrdered → broadcast; open
    * intervals clip at the horizon (max event time + 1µs, 1-row
    * broadcast). The oracle replays the same result as a plain THETA
    * join — pinning that bucketing loses no pair.
    */
  def j12IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
    val oneUs = ev.groupBy(col("user_id"), col("us"))
      .agg(min_by(col("event_type"), col("event_id")).as("event_type"))
    val horizon = ev.agg((max(col("us")) + lit(1L)).as("__h"))
    val clipped = scd2(oneUs, "user_id", "us", "event_type")
      .crossJoin(broadcast(horizon))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        coalesce(col("valid_to"), col("__h")).as("to_us"))
    val busy = ev.groupBy(expr(s"us DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("day")).limit(BusyDays)
    clipped
      .select(col("*"), explode(sequence(
        expr(s"valid_from DIV $DayUs"), expr(s"(to_us - 1) DIV $DayUs"))).as("day"))
      .join(broadcast(busy), "day")
      .select(col("user_id"), col("event_type"), col("valid_from"), col("to_us"),
        col("day"), col("n_events"),
        (least(col("to_us"), (col("day") + 1) * lit(DayUs)) -
          greatest(col("valid_from"), col("day") * lit(DayUs))).as("overlap_us"))
      .orderBy(col("user_id"), col("valid_from"), col("day"))
  }
}
