package graft

/** Dev-only probe: run one declared query N times in a session and print
  * per-run wall seconds (bench reports only min-of-3 — this shows the
  * cold/warm split so driver-side analysis cost is visible). Usage:
  *   tools/run.sh graft.DevProbe <sfDir> <query> [runs]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 4
    val spark = Engine.session("graft-probe")
    val q = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
