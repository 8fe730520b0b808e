package graft

/** Dev tool: run a declared query and dump its EXECUTED (AQE-final)
  * plan — static explain can't show runtime exchange/stage reuse.
  * Usage: tools/run.sh graft.ExecutedPlanDump <sfDir> <name...>
  */
object ExecutedPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session("graft-execdump")
    args.drop(1).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // collect() drives THIS QueryExecution (a write would build its
      // own), so the printed plan is the AQE-final one with any
      // ReusedQueryStage / ReusedExchange nodes visible
      df.collect()
      println(s"\n========== $n (executed) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
