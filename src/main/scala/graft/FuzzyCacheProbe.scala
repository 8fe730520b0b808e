package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: does the fuzzyContaminatedIds candidate persist()
  * re-hit across invocations? Prints whether the second invocation's
  * executed plan reads an InMemoryTableScan for the candidate subtree.
  * Usage: tools/run.sh graft.FuzzyCacheProbe [sfDir]
  */
object FuzzyCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-fzc-probe")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.operators.Curation.l9FuzzyDecontam(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(plan).length
      println(f"[fzc] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  inMemScans=$scans")
    }
    if (args.length > 1 && args(1) == "spin") {
      println(s"[fzc] spin pid=${ProcessHandle.current().pid()}")
      val t0 = System.nanoTime()
      var n = 0
      while ((System.nanoTime() - t0) / 1e9 < 40) {
        graft.operators.Curation.l9FuzzyDecontam(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        n += 1
      }
      println(f"[fzc] spin: $n runs in 40 s")
    }
    spark.stop()
  }
}
