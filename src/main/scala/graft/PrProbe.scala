package graft

import graft.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only probe: per-round job/stage/task-time accounting for the
  * pageRankConverged round loop at sf0.1.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-pr-probe")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = s.stageInfo
        println(f"    [stage ${si.stageId}] ${si.numTasks} tasks, " +
          f"runMs=${si.taskMetrics.executorRunTime} " +
          f"cpuMs=${si.taskMetrics.executorCpuTime / 1000000} " +
          f"name=${si.name.takeWhile(_ != '\n').take(60)}")
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    })
    def snap(): (Int, Int, Int, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get, deserMs.get, gcMs.get)

    val t = Tables(spark, sfDir)
    val flows = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct()
      .persist()
    val edges = flows.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(flows.select(col("c").as("src"), col("s").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val linked = edges.join(deg, "src").repartition(col("src")).persist()
    val nodes = linked.select(col("src").as("node")).distinct().persist()
    linked.count(); nodes.count() // warm the caches

    def runRounds(tag: String): Unit = {
      var scores = nodes.select(col("node"), lit(1000000L).as("score")).materialize()
      val t0 = System.nanoTime()
      for (i <- 1 to 8) {
        val r0 = System.nanoTime()
        val (j0, s0, k0, m0, d0, g0) = snap()
        val inbound = linked
          .join(scores.select(col("node").as("src"), col("score")), "src")
          .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
          .withColumnRenamed("dst", "node")
        val next = scores.select(col("node"), col("score").as("prev"))
          .join(inbound, Seq("node"), "left_outer")
          .select(col("node"),
            expr(s"(150000000 + 850 * coalesce(mass, 0L)) DIV 1000").as("score"),
            col("prev"))
          .materialize()
        val delta = next
          .agg(coalesce(max(abs(col("score") - col("prev"))), lit(0L)))
          .first().getLong(0)
        scores = next.select(col("node"), col("score"))
        val (j1, s1, k1, m1, d1, g1) = snap()
        println(f"[pr-$tag] round $i: ${(System.nanoTime() - r0) / 1e9}%.3f s " +
          f"jobs=${j1 - j0} stages=${s1 - s0} tasks=${k1 - k0} " +
          f"taskMs=${m1 - m0} deserMs=${d1 - d0} gcMs=${g1 - g0} delta=$delta")
      }
      println(f"[pr-$tag] total 8 rounds: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // persist + delta-action variant: one action per round (the delta agg
    // materializes the cache), lineage truncated only every `ckptEvery`
    // rounds — vs the per-round localCheckpoint + delta two-action form
    def runRoundsPersist(tag: String, ckptEvery: Int): Unit = {
      var scores = nodes.select(col("node"), lit(1000000L).as("score")).materialize()
      val t0 = System.nanoTime()
      for (i <- 1 to 8) {
        val r0 = System.nanoTime()
        val (j0, s0, k0, m0, d0, g0) = snap()
        val inbound = linked
          .join(scores.select(col("node").as("src"), col("score")), "src")
          .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
          .withColumnRenamed("dst", "node")
        var next = scores.select(col("node"), col("score").as("prev"))
          .join(inbound, Seq("node"), "left_outer")
          .select(col("node"),
            expr(s"(150000000 + 850 * coalesce(mass, 0L)) DIV 1000").as("score"),
            col("prev"))
        next = if (i % ckptEvery == 0) next.materialize() else next.persist()
        val delta = next
          .agg(coalesce(max(abs(col("score") - col("prev"))), lit(0L)))
          .first().getLong(0)
        scores = next.select(col("node"), col("score"))
        val (j1, s1, k1, m1, d1, g1) = snap()
        println(f"[pr-$tag] round $i: ${(System.nanoTime() - r0) / 1e9}%.3f s " +
          f"jobs=${j1 - j0} stages=${s1 - s0} tasks=${k1 - k0} " +
          f"taskMs=${m1 - m0} deserMs=${d1 - d0} gcMs=${g1 - g0} delta=$delta")
      }
      println(f"[pr-$tag] total 8 rounds: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    runRounds("w1")
    runRounds("w2")
    runRoundsPersist("p1-e4", 4)
    runRoundsPersist("p2-e4", 4)
    runRoundsPersist("p3-e3", 3)

    // component isolation, all warm (run each 3x, min):
    def timed(tag: String)(body: => Unit): Unit = {
      println(s"[iso-begin] $tag")
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[iso] $tag: min=${ts.min}%.3f s runs=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val sc0 = nodes.select(col("node"), lit(1000000L).as("score")).materialize()
    timed("bare linked scan+count-agg") {
      linked.agg(sum(col("d"))).first()
    }
    timed("linked groupBy(dst).sum(d)") {
      linked.groupBy(col("dst")).agg(sum(col("d"))).write.format("noop").mode("overwrite").save()
    }
    timed("linked join scores (no agg)") {
      linked.join(sc0.select(col("node").as("src"), col("score")), "src")
        .agg(sum(col("score"))).first()
    }
    timed("groupBy(dst).count") {
      linked.groupBy(col("dst")).agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    val linkedRaw = edges.join(deg, "src")
    timed("UNCACHED lineage groupBy(dst).sum(d)") {
      linkedRaw.groupBy(col("dst")).agg(sum(col("d"))).write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    timed("groupBy(dst).sum(d) vectorized-map") {
      linked.groupBy(col("dst")).agg(sum(col("d"))).write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "false")
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    timed("groupBy(dst).sum(d) twolevel-off") {
      linked.groupBy(col("dst")).agg(sum(col("d"))).write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
    // contribution-precompute variant: per-node contrib = score DIV d
    // joined broadcast into a NARROWER (src, dst)-only edge cache
    val edgesOnly = edges.repartition(col("src")).persist()
    val degN = deg.withColumnRenamed("src", "node").persist()
    edgesOnly.count(); degN.count()
    timed("contrib-variant full update") {
      val contrib = sc0.join(degN, "node")
        .select(col("node").as("src"), expr("score DIV d").as("contrib"))
      val inbound = edgesOnly
        .join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("mass"))
        .withColumnRenamed("dst", "node")
      sc0.select(col("node"), col("score").as("prev"))
        .join(inbound, Seq("node"), "left_outer")
        .select(col("node"),
          expr(s"(150000000 + 850 * coalesce(mass, 0L)) DIV 1000").as("score"),
          col("prev"))
        .write.format("noop").mode("overwrite").save()
    }
    val synth = spark.range(0, 1170000, 1, 32)
      .select((col("id") % 16384).as("dst"), (col("id") % 97 + 1).as("d")).persist()
    synth.count()
    timed("SYNTH range groupBy(dst).sum(d)") {
      synth.groupBy(col("dst")).agg(sum(col("d"))).write.format("noop").mode("overwrite").save()
    }
    timed("full update (join+group+leftjoin, no ckpt)") {
      val inbound = linked
        .join(sc0.select(col("node").as("src"), col("score")), "src")
        .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
        .withColumnRenamed("dst", "node")
      sc0.select(col("node"), col("score").as("prev"))
        .join(inbound, Seq("node"), "left_outer")
        .select(col("node"),
          expr(s"(150000000 + 850 * coalesce(mass, 0L)) DIV 1000").as("score"),
          col("prev"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
