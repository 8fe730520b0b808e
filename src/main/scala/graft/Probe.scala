package graft

/** Supported single-query timing probe: `runMain graft.Probe <query>…`
  * runs each named declared query against `SPARK_GRAFT_SF_DIR` and
  * prints its warm best-of-3 noop-sink wall time — the same measurement
  * discipline as [[graft.Twins]], for spot-checking one query without a
  * full bench sweep.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-probe")
    val qs = SparkEntry.queries
    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = (1 to 3).map(_ => once()).min
      println(f"probe $name%-22s $best%.3f s")
    }
    spark.stop()
  }
}
