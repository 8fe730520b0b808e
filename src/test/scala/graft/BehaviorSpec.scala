package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** B1/B2 behavioral-analytics semantics the DuckDB oracles can't see:
  * ordered-funnel step gating on a constructed history, retention
  * cohort-size invariants.
  */
class BehaviorSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("B1 funnel: steps gate strictly on the previous step's first time") {
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "purchase", 50L), (2L, "view", 100L), (2L, "click", 150L),
      (3L, "view", 10L),
      (4L, "click", 10L), (4L, "purchase", 20L))
      .toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val m = Behavior.funnelTimes(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    // user 4 never did step 1 — not in the funnel at all
    assert(m.keySet == Set(1L, 2L, 3L))
    assert(m(1L).getAs[Long]("t0") == 100L && m(1L).getAs[Long]("t2") == 300L)
    // user 2's purchase precedes the click frontier — step 3 not reached
    assert(m(2L).getAs[Long]("t1") == 150L)
    assert(m(2L).isNullAt(m(2L).fieldIndex("t2")))
    assert(m(3L).isNullAt(m(3L).fieldIndex("t1")))
  }

  test("B5 sessions: constructed histories incl. the exact-gap boundary") {
    val m = 60L * 1000000 // one minute in micros
    val ev = Seq(
      // user 1: {0, 10m} and {50m, 55m} → 2 sessions, spans 10m + 5m
      (1L, 0L), (1L, 10 * m), (1L, 50 * m), (1L, 55 * m),
      // user 2: a single event → 1 session, zero span
      (2L, 0L),
      // user 3: gap EXACTLY 30m — session_window MERGES an event landing
      // exactly on the padded session end (a new session needs a gap
      // STRICTLY over 30m; the oracles replay `>`)
      (3L, 0L), (3L, 30 * m),
      // user 4: one microsecond past the gap → two sessions
      (4L, 0L), (4L, 30 * m + 1))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        lit(1.0).as("value"))
    val got = Behavior.sessionRollup(graft.operators.Relational.sessionWindows(ev))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"),
          r.getAs[Long]("max_session_events"), r.getAs[Long]("active_span_us"),
          r.getAs[Long]("events_per_session_permille")))).toMap
    assert(got(1L) == ((4L, 2L, 2L, 15 * m, 2000L)))
    assert(got(2L) == ((1L, 1L, 1L, 0L, 1000L)))
    assert(got(3L) == ((2L, 1L, 2L, 30 * m, 2000L)))
    assert(got(4L) == ((2L, 2L, 1L, 0L, 1000L)))
    // fixture consistency with the T3 per-session view: totals agree
    val per = graft.operators.Relational.sessionWindowBatch(spark, sf)
    val rolled = Behavior.b5Sessions(spark, sf)
    assert(rolled.agg(sum(col("n_events"))).first().getLong(0) ==
      per.agg(sum(col("n"))).first().getLong(0))
    assert(rolled.agg(sum(col("n_sessions"))).first().getLong(0) == per.count())
  }

  test("B1 funnel on the fixture: counts monotone non-increasing, step 1 exact") {
    val rows = Behavior.b1Funnel(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("step")).sameElements(Array(1, 2, 3)))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
    val viewers = tables.events.filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(counts(0) == viewers)
  }

  test("B2 retention: day-0 rows are the cohort sizes and bound later offsets") {
    val r = Behavior.b2Retention(spark, sf).collect()
    assert(r.forall(_.getAs[Long]("day_offset") >= 0L))
    r.groupBy(_.getAs[Long]("cohort_day")).foreach { case (_, rows) =>
      val d0 = rows.find(_.getAs[Long]("day_offset") == 0L)
      assert(d0.isDefined, "every cohort is active on its first day")
      rows.foreach(x =>
        assert(x.getAs[Long]("n_users") <= d0.get.getAs[Long]("n_users")))
    }
    val users = tables.events.select("user_id").distinct().count()
    assert(r.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum == users)
  }

  test("B3 transitions: adjacent pairs per user under the total (us, event_id) order") {
    val ev = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "view", 30L, 3L),
      // user 2: two events on the SAME microsecond — event_id breaks the tie
      (2L, "view", 5L, 4L), (2L, "purchase", 5L, 5L),
      (3L, "signup", 7L, 6L)) // single event: no transition
      .toDF("user_id", "event_type", "us", "event_id")
    val got = Behavior.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(got == Map(("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L))
    // conservation: fixture transition counts sum to Σ_users (n_events − 1)
    val total = Behavior.b3Transitions(spark, sf).agg(sum("n")).first().getLong(0)
    val users = tables.events.groupBy("user_id").count()
      .agg(sum(col("count") - 1)).first().getLong(0)
    assert(total == users)
  }

  test("B4 attribution: only a click within the window attributes; later clicks don't") {
    val us = 1000000L // 1s in micros; window below = 100s
    val ev = Seq(
      (1L, "click", 0L, 1L), (1L, "purchase", 50 * us, 2L),     // attributed
      (2L, "purchase", 10 * us, 3L),                            // organic: no click
      (3L, "click", 0L, 4L), (3L, "purchase", 200 * us, 5L),    // organic: stale click
      (4L, "purchase", 10 * us, 6L), (4L, "click", 20 * us, 7L) // organic: click after
    ).map { case (u, t, ts, id) => (u, t, 10.0, ts, id) }
      .toDF("user_id", "event_type", "value", "us", "event_id")
    val got = Behavior.lastTouch(ev, windowUs = 100 * us).collect()
      .map(r => r.getAs[Boolean]("attributed") -> r.getAs[Long]("n_purchases"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == Map(true -> 1L, false -> 3L))
    // fixture-level conservation: buckets partition all purchases
    val b4 = Behavior.b4Attribution(spark, sf)
      .agg(sum("n_purchases")).first().getLong(0)
    val purchases = tables.events.filter(col("event_type") === "purchase").count()
    assert(b4 == purchases)
  }
}
