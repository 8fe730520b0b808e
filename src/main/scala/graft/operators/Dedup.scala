package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L1/L2/L6 (SURVEY.md §2.9): exact + near-duplicate detection for
  * LLM-training-corpus curation, designed for 100 TB:
  *
  *  - Exact dedup keys on a 256-bit content hash, so the shuffle key is
  *    32 bytes regardless of document size and the groupBy is a plain
  *    hash-partitioned aggregate (no skew beyond true duplicate clusters).
  *  - MinHash signatures are computed per-row with higher-order array
  *    functions (`transform`/`array_min`) — a narrow, whole-stage-codegen'd
  *    map with NO shuffle and NO explode blow-up; each doc contributes one
  *    row regardless of token count.
  *  - The similarity self-join is banded-LSH bucketed: pairs are generated
  *    only within (band, band_hash) buckets, never all-pairs O(n²).
  */
object Dedup {

  /** Space-separated tokens of a text column (fixture docs are
    * single-space word soup; callers needing unicode-aware tokenization
    * pass their own tokenizer column).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Reusable exact-dedup operator: keep one row per distinct `keyCols`
    * content, choosing the row with the smallest `tieBreak`. Window-rank
    * over the content hash — one shuffle on a fixed-width key.
    */
  def exact(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature columns over the distinct-token set.
    * sig_i = min over tokens of md5(i ‖ ":" ‖ token) — the "permutation"
    * family is keyed md5, totally ordered as lowercase hex, so the exact
    * same signature is computable in ANSI SQL (the DuckDB oracle checks
    * every signature byte). Per-row, codegen'd, shuffle-free.
    */
  def minhashSig(text: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(tokens(text), t => md5(concat(lit(s"$i:"), t))))
        .as(f"sig_$i%02d")
    }

  /** L2 declared query: full MinHash signature matrix for every document.
    * 16 hashes = 8 bands × 2 rows (see [[simJoin]]).
    */
  def l2Minhash(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(col("doc_id") +: minhashSig(col("text"), 16): _*)
      .orderBy(col("doc_id"))
  }

  /** L1 declared query: exact-dedup summary — one row per distinct content
    * hash with the surviving doc id and the duplicate count. (The fixture
    * corpus has no exact dups, so n_copies is 1 throughout; duplicate
    * semantics are exercised by the scalatest suite with injected copies.)
    */
  def l1ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("content_sha", sha2(col("text"), 256))
      .groupBy(col("content_sha"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("content_sha"), col("n_copies"))
      .orderBy(col("keeper_id"))
  }

  /** Banded-LSH candidate buckets: one row per (doc, band) with the band's
    * hash. Docs sharing a (band_idx, band_hash) cell are near-dup
    * candidates. bands×rowsPerBand signatures are computed inline.
    */
  def lshBuckets(docs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minhashSig(col("text"), bands * rowsPerBand)
    val withSig = docs.select(col("doc_id") +: sigs: _*)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(f"sig_${b * rowsPerBand + r}%02d"))
      struct(lit(b).as("band_idx"), md5(concat_ws("|", parts: _*)).as("band_hash"))
    }
    withSig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.band_hash").as("band_hash"))
  }

  /** L6: similarity self-join — near-duplicate pairs above a Jaccard
    * threshold, LSH-bounded.
    *
    * Plan shape (the 100 TB story): buckets are a narrow map + explode of
    * `bands` rows/doc; the self-join shuffles on (band_idx, band_hash) so
    * only same-bucket docs ever meet; candidate pairs are de-duplicated
    * BEFORE the (heavier) token arrays are joined back in, so the wide
    * rows traverse exactly one shuffle each. Exact Jaccard on the
    * distinct-token sets then filters false positives. Never O(n²).
    */
  def simJoin(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 2,
              threshold: Double = 0.8): DataFrame = {
    val b = lshBuckets(docs, bands, rowsPerBand)
    val candidates = b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val toks = docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    candidates
      .join(toks.withColumnRenamed("doc_id", "a_id").withColumnRenamed("toks", "a_toks"), "a_id")
      .join(toks.withColumnRenamed("doc_id", "b_id").withColumnRenamed("toks", "b_toks"), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
          size(array_union(col("a_toks"), col("b_toks"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** L6 declared query (rows-only check; cluster semantics are asserted in
    * scalatest — LSH output is approximate so no SQL oracle is declared).
    */
  def l6SimJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    simJoin(t.documents).orderBy(col("a_id"), col("b_id"))
  }
}
