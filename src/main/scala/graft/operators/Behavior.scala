package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B1/B2 (SURVEY.md §2.10): behavioral analytics over an event stream —
  * ordered conversion funnels and cohort retention. The two queries every
  * product-analytics engine ships first, expressed as keyed aggregations
  * so they scale like any other group-by (no per-user state machines, no
  * driver-side logic).
  *
  * Determinism: all times are integer epoch units (micros or days) and
  * every output is a count — exact on any engine.
  */
object Behavior {

  /** The ordered funnel steps (event types) a user must pass through.
    * A step counts only if it happens STRICTLY AFTER the user's earliest
    * completion of the previous step — the standard ordered-funnel
    * semantics (a purchase before the first view does not convert).
    */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Per-user earliest completion time of each funnel step, as epoch
    * micros (null = user never reached the step).
    *
    * Scale posture: one conditional-min aggregation per step, all keyed
    * on user_id — the first is a plain groupBy; each later step joins
    * the (narrow, one-row-per-user) frontier back to the events on the
    * SAME key, so at scale every stage co-partitions on user_id and the
    * event table is scanned once per step with its filter pushed down.
    * No collect_list of a user's history (unbounded per-user state), no
    * window over all events.
    */
  def funnelTimes(events: DataFrame,
                  steps: Seq[String] = FunnelSteps): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = events.select(col("user_id"),
      col("event_type"), expr("unix_micros(ts)").as("us"))
    val first = us.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t${i - 1}"
      acc.join(us.filter(col("event_type") === step), Seq("user_id"), "left")
        .groupBy((col("user_id") +: (0 until i).map(j => col(s"t$j"))): _*)
        .agg(min(when(col("us") > col(prev), col("us"))).as(s"t$i"))
    }
  }

  /** B1 declared query: users reaching each step of [[FunnelSteps]] in
    * order. Conversion is monotone by construction (step i+1 requires a
    * non-null step i time).
    */
  def b1Funnel(spark: SparkSession, dir: String): DataFrame = {
    val times = funnelTimes(Tables(spark, dir).events)
    val aggs = FunnelSteps.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val counts = times.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row of step counts into (step, step_name, n_users)
    counts.select(explode(array(FunnelSteps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(FunnelSteps(i)).as("step_name"),
        col(s"n$i").as("n_users"))): _*)).as("s"))
      .select(col("s.step"), col("s.step_name"), col("s.n_users"))
      .orderBy(col("step"))
  }

  /** B2 declared query: cohort retention — users grouped by their first
    * activity day (the cohort), counted on each later day they return.
    * Classic triangle output: (cohort_day, day_offset, n_users).
    *
    * Scale posture: distinct (user, day) first (two-phase, partial
    * map-side), then the per-user min-day cohort frame joins back on
    * user_id — both exchanges keyed on user_id, and the output is
    * cohorts × offsets, tiny relative to the input.
    */
  def b2Retention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir).events
      .select(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** B3 declared query: event-transition matrix — for each user's
    * time-ordered event stream, count every (event_type → next event_type)
    * adjacent pair. The path-analysis primitive (Markov transition counts,
    * "what do users do after X") behind sankey/flow reports.
    *
    * Scale posture: ONE per-user window pass (`lead`) — state per key is a
    * single row, the sort is within user partitions (skew-bounded: a user's
    * history, not the table), and the output is |types|² regardless of
    * input size. Tie-break on event_id makes the ordering total, so the
    * count is deterministic under any physical row order.
    */
  def transitions(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("next_type"))
  }

  def b3Transitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id")))

  /** B4 declared query: last-touch attribution — every purchase is
    * attributed to the same user's most recent click at most
    * [[AttributionWindowUs]] micros before it; purchases with no such
    * click count as organic. Output: per day, attributed vs organic
    * purchase counts and revenue.
    *
    * Scale posture: a single per-user window pass carries the last click
    * time forward (`last(ignoreNulls)` over rows ≤ current) — no
    * self-join, no per-user collect, state is one value per key; the
    * day-level rollup is an ordinary two-phase aggregate. This is the
    * batch twin of the J9 stream–stream attribution join, expressed
    * without a join at all.
    */
  val AttributionWindowUs: Long = 24L * 3600 * 1000000

  def lastTouch(ev: DataFrame,
                windowUs: Long = AttributionWindowUs): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ev.withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(expr("us DIV 86400000000").as("day"),
        (col("last_click_us").isNotNull &&
          col("us") - col("last_click_us") <= lit(windowUs))
          .as("attributed"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.Det.dsum(col("value"), 2).as("revenue"))
      .orderBy(col("day"), col("attributed"))
  }

  def b4Attribution(spark: SparkSession, dir: String): DataFrame =
    lastTouch(Tables(spark, dir).events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(ts)").as("us"), col("event_id")))

  /** The session-window gap shared with the T3 session queries — an
    * ALIAS of [[Relational.SessionGapUs]] (the one definition the
    * session_window duration and the oracles also derive from), so the
    * pad subtracted in [[sessionRollup]] is by construction the pad
    * `session_window` added.
    */
  val SessionGapUs: Long = Relational.SessionGapUs

  /** B5: per-user sessionization stats — the engagement rollup every
    * product-analytics suite ships next to funnels and retention: how
    * many sessions a user has, how dense they are (events/session) and
    * how long the user is actually active inside them (summed
    * first-to-last-event span — the session_window end pads the gap, so
    * it is subtracted back out).
    *
    * Built ON TOP of [[Relational.sessionWindowBatch]] (Spark's native
    * `session_window`, one keyed aggregate) rather than re-deriving
    * sessions: one sessionization definition serves T3's per-session
    * view and B5's per-user view, and the rollup is an ordinary
    * user-keyed two-phase aggregate over the (already session-sized)
    * frame — no second pass over raw events, no per-user windows.
    * events_per_session is an exact integer permille (floor DIV).
    */
  def b5Sessions(spark: SparkSession, dir: String): DataFrame =
    sessionRollup(Relational.sessionWindowBatch(spark, dir))

  /** The user-keyed rollup over a [[Relational.sessionWindows]] frame. */
  def sessionRollup(perSession: DataFrame): DataFrame =
    perSession
      .groupBy(col("user_id"))
      .agg(
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        sum(col("session_end_us") - lit(SessionGapUs) - col("session_start_us"))
          .as("active_span_us"))
      .withColumn("events_per_session_permille",
        expr("n_events * 1000 DIV n_sessions"))
      .orderBy(col("user_id"))
}
