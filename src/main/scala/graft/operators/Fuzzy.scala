package graft.operators

import graft.Ckpt._
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

  /** J10 declared query: the entity-resolution MATCH TABLE over part
    * names — distinct names within Levenshtein ≤ 4, blocked on the last
    * name token, each side carrying its record count.
    *
    * The load-bearing step is the DISTINCT-VALUE COLLAPSE before the
    * quadratic stage (the same set-collapse discipline as the LSH
    * self-join): a low-cardinality name column over many records would
    * otherwise emit every identical-name record pair — quadratic output
    * for zero information (observed: 139 s and ~10⁷ pairs at sf0.1
    * record-level vs sub-second name-level; the fixture has 64 distinct
    * names over 20k parts). A record-level result is the match table
    * re-joined to records BY EQUALITY on name — linear, never pairwise.
    * Dist ties broken by the full name pair for a total output order.
    */
  def j10FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: feeds the candidate frame AND both count joins —
    // without it the catalog scan + aggregate runs four times
    val names = Tables(spark, dir).part
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .materialize()
    // id IS the name (distinct by construction): fuzzyPairs' canonical
    // a_id < b_id orientation becomes plain lexicographic name order,
    // which the oracle replays directly; counts re-attach post-candidates
    val collapsed = names.select(col("p_name").as("name_id"), col("p_name"))
    fuzzyPairs(collapsed, "name_id", "p_name",
      substring_index(col("p_name"), " ", -1), maxDist = 4)
      .join(names.select(col("p_name").as("a_id"), col("n_parts").as("n_parts_1")), "a_id")
      .join(names.select(col("p_name").as("b_id"), col("n_parts").as("n_parts_2")), "b_id")
      .select(col("a_id").as("name_1"), col("b_id").as("name_2"),
        col("n_parts_1"), col("n_parts_2"), col("dist"))
      .orderBy(col("name_1"), col("name_2"))
  }
}
