package graft

/** Dev-only probe: run s2_admission N times in one session and print every
  * DISTINCT metrics frame observed — a determinism check for the MQ drain
  * (the driver's oracle found a hash mismatch the local sweep missed).
  * Usage: tools/run.sh graft.S2Probe <sfDir> [runs]
  */
object S2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 20
    val spark = Engine.session("graft-s2probe")
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for (i <- 1 to runs) {
      val df = graft.streaming.Streams.s2Admission(spark, sfDir)
      val s = df.collect().map(_.toSeq.mkString(",")).mkString("\n")
      seen(s) = seen.getOrElse(s, 0) + 1
      if (i % 5 == 0) println(s"[s2probe] run $i: ${seen.size} distinct frame(s)")
    }
    println(s"[s2probe] TOTAL runs=$runs distinct=${seen.size}")
    seen.zipWithIndex.foreach { case ((s, n), i) =>
      println(s"[s2probe] ---- variant ${i + 1} (seen $n times) ----")
      println(s)
    }
    spark.stop()
  }
}
