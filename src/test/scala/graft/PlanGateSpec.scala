package graft

import org.apache.spark.sql.functions._

/** Round-15 mandate: promote the required-single-partition plan gate —
  * the engine's strongest scale-correctness invariant, previously
  * enforced only over Scale10's measured subset plus the JPEG spec rows
  * — to EVERY declared query. A `ShuffleExchangeExec(SinglePartition)`
  * feeding anything but a global aggregate / collect-limit / an
  * aggregate-bounded frame is the plan-level serialization point that
  * strangles a 1000-executor cluster regardless of data volume; the
  * walk (and its documented allowances) is
  * [[Scale10.singlePartitionViolations]], shared verbatim with the
  * SCALE10/SCALE100 runs so the suite and the scale proof can never
  * drift apart.
  *
  * Mechanics: every `SparkEntry.queries` entry executes at sf0.001
  * under a registered [[Scale10.PlanAudit]] listener (the exact object
  * the scale runs register), and the walk is ALSO applied synchronously
  * to each post-execution AQE plan for per-query attribution — the
  * async listener queue is then drained and checked to add nothing the
  * synchronous walk didn't see. The negative test injects the canonical
  * offender (`Window.orderBy` with no partitionBy over corpus rows) and
  * proves both paths fire.
  */
class PlanGateSpec extends SparkSuite {

  /** Documented per-query allowances: violation strings (substring
    * match) that are accepted for a named query, each with a reason a
    * reviewer can audit against the bounded-window inventory in
    * RelationalSpec. Exactly ONE survives the r15 sweep:
    *
    *  - `m2_ann_recall`: the recall counters rank the band-cut
    *    candidate frame globally (row_number over (cosine, vec_id)) —
    *    a ≤ ~2·pad-row frame by the band-cut construction (pinned by
    *    the Similarity cut-size specs + the inventory row), but the
    *    bound comes from a FILTER, not an aggregate, so the walk's
    *    aggregate-bounded rule can't see it. The single-task sort over
    *    ≤ tens of rows is the point of the design: it replaced a
    *    four-branch join/agg consumption that tripled the tiny-job
    *    count (see Eval.m2AnnRecall's doc).
    *
    * (m6_diversity's entropy window was the only other hit; it was
    * RESTRUCTURED to a global aggregate + broadcast rather than
    * allowed — see Eval.diversityOf.)
    */
  val Allowed: Map[String, Seq[String]] = Map(
    "m2_ann_recall" -> Seq("Sort <- Exchange SinglePartition"))

  test("plan gate: every declared query is free of required-single-partition exchanges") {
    val audit = new Scale10.PlanAudit
    spark.listenerManager.register(audit)
    audit.enabled = true
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val direct = scala.collection.mutable.Set.empty[String]
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        val viol = Scale10.singlePartitionViolations(df.queryExecution.executedPlan)
        direct ++= viol
        val unallowed = viol.filterNot(v => Allowed.getOrElse(name, Nil).exists(v.contains))
        if (unallowed.nonEmpty) bad += s"$name: ${unallowed.mkString("; ")}"
      }
    } finally {
      audit.enabled = false
      spark.listenerManager.unregister(audit)
    }
    assert(bad.isEmpty,
      s"required-single-partition stages in declared plans:\n  ${bad.mkString("\n  ")}")
    // The async listener (the mechanism the SCALE runs rely on) must not
    // have seen anything outside the allowance — it also observes
    // intermediate actions of memoized builder chains, so this is a
    // strictly WIDER net than the per-final-plan walk.
    org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    val fromListener = audit.violations.toArray.map(_.asInstanceOf[String]).toSet
    val extra = fromListener -- direct
    assert(extra.isEmpty,
      s"listener saw violation shapes absent from every final plan " +
        s"(an intermediate builder action regressed):\n  ${extra.mkString("\n  ")}")
  }

  test("plan gate negative: an unpartitioned corpus-wide window fires both paths") {
    val offender = tables.lineitem
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
      .select(col("rn"), col("l_orderkey"))
    val audit = new Scale10.PlanAudit
    spark.listenerManager.register(audit)
    audit.enabled = true
    try {
      offender.write.format("noop").mode("overwrite").save()
      // synchronous walk fires
      val viol = Scale10.singlePartitionViolations(offender.queryExecution.executedPlan)
      assert(viol.exists(_.contains("Exchange SinglePartition")),
        s"synchronous walk missed the injected offender: $viol")
      // listener path fires too (delivery is async — drain the bus)
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      assert(!audit.violations.isEmpty, "PlanAudit listener never fired on the offender")
    } finally {
      audit.enabled = false
      spark.listenerManager.unregister(audit)
    }
  }
}
