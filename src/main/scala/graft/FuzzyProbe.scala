package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: candidate/verify volumes inside l9_fuzzy_decontam.
  * Usage: tools/run.sh graft.FuzzyProbe [sfDir]
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-fuzzy-probe")
    val t = Tables(spark, sfDir)
    import graft.operators.{Curation, Dedup}
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"),
      Curation.splitExpr(col("doc_id")).as("split"))
    val train = docs.filter(col("split") === "train")
    val bench = docs.filter(col("split") === "test")
    println(s"[fz] train=${train.count()} bench=${bench.count()}")
    val cb = Dedup.bandedToks(train.select(col("doc_id"), col("text")))
    val bb = Dedup.bandedToks(bench.select(col("doc_id"), col("text")))
    def bandRows(d: org.apache.spark.sql.DataFrame, side: String) =
      d.select(col("doc_id").as(s"${side}_id"), col("n").as(s"${side}_n"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val joined = bandRows(cb, "train")
      .join(broadcast(bandRows(bb, "bench")), Seq("band_idx", "band_hash"))
    println(s"[fz] raw band matches=${joined.count()}")
    val cand = joined
      .filter(least(col("train_n"), col("bench_n")).cast("double")
        >= greatest(col("train_n"), col("bench_n")) * Dedup.DefaultThreshold - 1e-9)
      .select(col("train_id"), col("bench_id")).distinct()
    println(s"[fz] candidate pairs=${cand.count()} distinct train ids=${cand.select(col("train_id")).distinct().count()}")
    val avgToks = train.select(avg(size(array_distinct(Dedup.tokens(col("text")))))).first()
    println(s"[fz] avg distinct tokens/train doc=$avgToks")
    def nsets(d: org.apache.spark.sql.DataFrame) = d
      .select(array_sort(transform(array_distinct(Dedup.tokens(col("text"))), x => md5(x))).as("t"))
      .select(md5(concat_ws("|", col("t"))).as("sig")).distinct().count()
    println(s"[fz] distinct train token-sets=${nsets(train)} bench token-sets=${nsets(bench)}")
    spark.stop()
  }
}
