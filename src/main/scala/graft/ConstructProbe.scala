package graft

/** Dev-only probe: frame CONSTRUCTION + planning cost per declared query
  * (fn call through executedPlan, no action) — where Catalyst analysis
  * overhead concentrates. Second pass per query so session memos and
  * probe warmup don't pollute the ranking.
  * Usage: tools/run.sh graft.ConstructProbe [sfDir] [minSecToPrint]
  */
object ConstructProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minS = if (args.length > 1) args(1).toDouble else 0.05
    val spark = Engine.session("graft-construct-probe")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.executedPlan; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[construct] $name failed: ${e.getMessage}"); -1.0 }
      }
      val c1 = once(); val c2 = once()
      out += ((name, c1, c2))
    }
    println(f"[construct] total cold=${out.map(_._2).filter(_ > 0).sum}%.1f s " +
      f"warm=${out.map(_._3).filter(_ > 0).sum}%.1f s over ${out.size} queries")
    out.filter(_._3 >= minS).sortBy(-_._3).foreach { case (n, c1, c2) =>
      println(f"[construct] $n%-24s cold=$c1%6.2f warm=$c2%6.2f")
    }
    spark.stop()
  }
}
