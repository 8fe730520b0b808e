package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared operator query: name, Spark implementation, and (when
  * SQL-expressible) the DuckDB oracle the driver replays at sf0.01.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Determinism helpers for the DuckDB hash-compare (SURVEY.md §5.1, §7
  * "oracle determinism"). Double sums are order-dependent: at sum
  * magnitudes ~1e9 the Spark-vs-DuckDB accumulation difference (~1e-4)
  * would randomly flip a value rounded to 2 decimals. Summing in DECIMAL
  * is exact and order-independent, so both engines produce bit-identical
  * results; the final round+cast-to-double is then also bit-identical.
  */
object Det {
  /** Exact order-independent sum: cast to decimal, sum, round, to double.
    * Oracle twin: `CAST(ROUND(SUM(CAST(x AS DECIMAL(30,6))), s) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(30,6)")), scale).cast("double")

  /** SQL fragment for the oracle side of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(30,6))), $scale) AS DOUBLE)"

  /** Order-independent rounded average: exact DECIMAL sum (per-element cast
    * at 12 dp is deterministic in both engines), one double division, one
    * round — no accumulation-order sensitivity, unlike `ROUND(AVG(x), s)`
    * whose half-ulp drift can flip a rounded digit at larger scale factors.
    * Null semantics match AVG: the divisor counts non-null values only.
    */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast("decimal(30,12)")).cast("double") / count(c), scale)

  /** SQL fragment for the oracle side of [[davg]]. */
  def davgSql(expr: String, scale: Int = 4): String =
    s"ROUND(CAST(SUM(CAST($expr AS DECIMAL(30,12))) AS DOUBLE) / COUNT($expr), $scale)"
}
