package graft

/** Dev-only probe: split l0_pipeline's warm cost into frame-construction/
  * analysis time vs execution time. Usage: tools/run.sh graft.L0Probe [sfDir]
  */
object L0Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-l0-probe")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[l0] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import org.apache.spark.sql.functions._
    if (args.length > 1 && args(1) == "spin") {
      // warm up once, then loop CONSTRUCTION only for external jstack
      val w = graft.operators.Curation.l0Pipeline(spark, sfDir)
      w.write.format("noop").mode("overwrite").save()
      println(s"[l0] spin pid=${ProcessHandle.current().pid()}")
      val t0 = System.nanoTime()
      var n = 0
      while ((System.nanoTime() - t0) / 1e9 < 40) {
        graft.operators.Curation.l0Pipeline(spark, sfDir)
          .queryExecution.executedPlan
        n += 1
      }
      println(f"[l0] spin: $n constructions in 40 s (${40.0 / n}%.3f s each)")
      spark.stop(); return
    }
    for (i <- 1 to 4) {
      val docs = t(s"run$i docs")(Tables(spark, sfDir).documents)
      val keepG = t(s"run$i gopher")(
        graft.operators.TextOps.gopherRules(docs).filter(col("keep")).select("doc_id"))
      val keepD = t(s"run$i dupspan")(
        graft.operators.Dedup.dupSpanCoverage(docs).filter(col("keep")).select("doc_id"))
      val survivors = docs.join(keepG, "doc_id").join(keepD, "doc_id")
      val bucketed = t(s"run$i ccnet")(
        graft.operators.TextOps.ccnetBuckets(survivors)
          .filter(col("bucket") =!= lit("tail")).persist())
      val df = t(s"run$i pack+join")(graft.operators.Curation.l0PipelineFrom(docs))
      t(s"run$i action")(df.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
