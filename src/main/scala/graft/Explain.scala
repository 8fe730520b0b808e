package graft

/** Dev tool: dump `explain("formatted")` for the scale-critical queries so
  * plan regressions (lost pushdown, lost broadcast, surprise shuffles)
  * are visible in review. Usage: tools/run.sh graft.Explain [sfDir] [name...]
  */
object Explain {
  val defaults = Seq("q1_pricing_summary", "q3_join_agg", "q14_promo",
    "q7_volume", "l1_exact_dedup", "l3_cosine_topk", "l3_ivf_topk",
    "l6_simjoin", "l6_ngram_simjoin", "l6_dedup_docs", "l4_tfidf", "l4_bm25",
    "l4_bm25_search", "l4_langid_ngram", "l4_termfreq_unicode",
    "l8_pack", "l8_quality_gate", "j7_asof", "s7_profile", "o6_upsert",
    "a8_freq_items", "l9_decontam", "l8_shuffle", "l3_sq_topk",
    "g1_pagerank", "g2_triangles", "j10_fuzzy_join", "s9_constraints",
    "b4_attribution", "l0_pipeline", "l1_dupspans", "l4_gopher",
    "l4_ccnet_buckets", "l8_stratified", "l8_temperature_mix", "l8_shards",
    "j12_interval_join", "m3_mrr", "m4_drift", "l4_keywords",
    "l11_semantic_dedup", "l3_batch_topk", "l6_embed_neardup",
    "l9_fuzzy_decontam", "m5_ndcg", "s10_sql_entry", "l4_quality_classifier",
    "m6_diversity", "m7_calibration", "m7_confusion", "m8_agreement",
    "m9_containment", "m9_overlap_matrix", "g1_pagerank_dangling",
    "g3_label_prop", "l1_substr_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else defaults
    val spark = Engine.session("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
