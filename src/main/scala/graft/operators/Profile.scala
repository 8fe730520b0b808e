package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: data profiling — the `ANALYZE`-style per-column statistics pass
  * (null count, exact distinct count, min/max) every warehouse exposes
  * and every curation run starts with.
  *
  * Scale shape: ONE aggregate pass over the table computes every
  * column's stats simultaneously (partial/final HashAggregate, no
  * per-column rescans); the single 1-row result explodes into one output
  * row per column. countDistinct is exact here because the contract
  * demands a hash-matching oracle — the scale posture swaps it for
  * approx_count_distinct (A3's HLL++) with zero shape change.
  */
object Profile {

  /** Numeric vs string column split for the `documents` fixture —
    * min/max land in typed columns (num_min/num_max BIGINT,
    * str_min/str_max STRING) so no cross-engine value rendering is
    * involved.
    */
  val NumCols: Seq[String] = Seq("doc_id", "n_chars")
  val StrCols: Seq[String] = Seq("text", "lang", "source")

  def s7Profile(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir).documents
    val all = NumCols ++ StrCols
    val aggs =
      all.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"))) ++
      all.flatMap(c => Seq(min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      NumCols.map(c => struct(
        lit(c).as("col_name"), col(s"${c}_nn").as("n_nulls"),
        col(s"${c}_nd").as("n_distinct"),
        col(s"${c}_mn").cast("long").as("num_min"),
        col(s"${c}_mx").cast("long").as("num_max"),
        lit(null).cast("string").as("str_min"),
        lit(null).cast("string").as("str_max"))) ++
      StrCols.map(c => struct(
        lit(c).as("col_name"), col(s"${c}_nn").as("n_nulls"),
        col(s"${c}_nd").as("n_distinct"),
        lit(null).cast("long").as("num_min"),
        lit(null).cast("long").as("num_max"),
        col(s"${c}_mn").as("str_min"), col(s"${c}_mx").as("str_max")))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("col_name"))
  }
}
