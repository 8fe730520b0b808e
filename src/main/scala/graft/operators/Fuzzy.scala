package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J10 (SURVEY.md §2.3): fuzzy (edit-distance) join — the entity-resolution
  * primitive: pair up records whose names agree up to a small Levenshtein
  * distance ("red widget" / "red widgets" are the same product; two catalog
  * feeds never spell it identically).
  *
  * Blocked, never all-pairs: candidates are generated only within a cheap
  * BLOCKING KEY (here the name's last token — entity-resolution's standard
  * "block on a stable field"), so the quadratic term is per-block m², not
  * corpus n². Hot blocks ride [[Dedup.saltedSelfJoin]], spreading a block's
  * m² candidate generation over K(K+1)/2 tasks. The Levenshtein check runs
  * once per CANDIDATE (post-block), codegen'd via Spark's 3-arg
  * `levenshtein(l, r, threshold)` which early-exits the DP loop past the
  * bound — at 100 TB the cost driver is candidate count, which blocking
  * controls, not the per-pair check.
  *
  * Recall caveat (documented, standard): a typo in the blocking token
  * itself escapes the block — production ER stacks run a second pass
  * blocked on another field (or phonetic key) and union candidates; the
  * operator takes any blocking expression, so that is a caller-side union
  * of two `fuzzyPairs` calls.
  */
object Fuzzy {

  /** Unordered (idA < idB) candidate pairs whose `nameCol` values are
    * within `maxDist` edits, blocked by `blockCol`. Output columns:
    * a_id, b_id, a_name, b_name, dist.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockCol: Column, maxDist: Int,
                 chunks: Int = Dedup.DefaultChunks): DataFrame = {
    val narrow = df.select(col(idCol), col(nameCol), blockCol.as("__blk"))
    val xId = col(s"x.$idCol"); val yId = col(s"y.$idCol")
    // canonicalize to a_id < b_id: the salted join emits each unordered
    // pair once but orients cross-chunk pairs by CHUNK (a Spark-hash
    // artifact no other engine can replay); the predicate is symmetric, so
    // least/greatest makes the output a pure function of the pair set
    Dedup.saltedSelfJoin(narrow, Seq("__blk"), idCol, chunks)
      .select(least(xId, yId).as("a_id"), greatest(xId, yId).as("b_id"),
        when(xId < yId, col(s"x.$nameCol")).otherwise(col(s"y.$nameCol")).as("a_name"),
        when(xId < yId, col(s"y.$nameCol")).otherwise(col(s"x.$nameCol")).as("b_name"),
        levenshtein(col(s"x.$nameCol"), col(s"y.$nameCol"), maxDist).as("dist"))
      // 3-arg levenshtein returns -1 once the running distance exceeds the
      // threshold (early exit) — keep only genuine matches
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** J10 declared query: near-identical part names — blocked on the last
    * name token, Levenshtein ≤ 4. Orders by the full pair for a total,
    * engine-independent output order.
    */
  def j10FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables(spark, dir).part
    fuzzyPairs(parts, "p_partkey", "p_name",
      substring_index(col("p_name"), " ", -1), maxDist = 4)
      .orderBy(col("a_id"), col("b_id"))
  }
}
