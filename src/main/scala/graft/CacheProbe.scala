package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: does persist() reuse survive a repartition in the
  * cached lineage across separate query invocations?
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-cache-probe")
    val t = Tables(spark, sfDir)
    def heavy(rep: Boolean) = {
      val base = if (rep) t.documents.repartition(32) else t.documents
      base.select(col("doc_id"),
        md5(concat_ws("|", transform(split(col("text"), " "), x => md5(x)))).as("h"))
        .persist()
    }
    for (rep <- Seq(false, true)) {
      println(s"=== repartition=$rep ===")
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val f = heavy(rep)
        val n = f.filter(col("h").isNotNull).count()
        println(f"  run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }
    // the real spanStarts chain, floor vs not
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val f = operators.Dedup.spanStartsProbe(t.documents)
      val n = f.filter(col("p").isNotNull).count()
      println(f"  spanStarts run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
    }
    spark.stop()
  }
}
