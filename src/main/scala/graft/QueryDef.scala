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
  /** Exact integer micro-units of a value: the decimal(30,6) cast is the
    * pinned cross-engine recovery of ≤6-dp fixture values from their
    * double representation (HALF_UP of the shortest decimal repr); ×1e6
    * and the long cast are then exact. ANSI throws loudly on a per-value
    * overflow (|x| ≥ ~9.2e12), rather than corrupting a sum.
    */
  def micros(c: Column): Column =
    (c.cast("decimal(30,6)") * lit(1000000L)).cast("long")

  /** The exact sum as DECIMAL(38,6) units — accumulated in dual long
    * limbs by [[graft.functions.FixedPointSum]] and reconstructed
    * exactly at evaluation: value-identical to
    * `SUM(CAST(x AS DECIMAL(30,6)))` (same result TYPE too) at ~2.5×
    * less aggregate cost — the decimal adds leave the per-row hot path —
    * with the same ±2^124 µ headroom. Constructed DIRECTLY as an
    * expression (not via the `sum_micros_fixed` registry name, which
    * GraftExtensions registers for SQL users) so every Det-using
    * declared query works under ANY SparkSession, extensions or not.
    */
  private def sumExact(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.FixedPointSum(ColumnBridge.expression(micros(c)))
        .toAggregateExpression())
  }

  /** Exact order-independent sum: limb sum, then the SAME
    * `round(decimal, s).cast(double)` tail as the original decimal
    * formulation — one HALF_UP rounding, one correctly-rounded
    * decimal→double conversion, bit-identical to the oracle twin
    * `CAST(ROUND(SUM(CAST(x AS DECIMAL(30,6))), s) AS DOUBLE)` across
    * the aggregate's full range. (An earlier draft routed the rounded
    * value through integral `div` — whose result is BIGINT — and a
    * double-then-divide tail: two narrowings the decimal path doesn't
    * have, diverging past 2^53 and overflowing past 2^63.)
    */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sumExact(c), scale).cast("double")

  /** SQL fragment for the oracle side of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(30,6))), $scale) AS DOUBLE)"

  /** Order-independent rounded average with EXACT half-up rounding.
    *
    * `round(double(sum)/count, s)` is not cross-engine deterministic: when
    * sum/count lands exactly on a half at scale s (e.g. 1403.37/24 =
    * 58.47375), Spark rounds the shortest decimal repr of the double
    * while DuckDB rounds the binary value — they disagree whenever the
    * closest double sits on the "wrong" side (observed at sf0.1).
    * So the rounding happens in exact integer arithmetic instead:
    *
    *   R = floor((2·S·10^(s+6) + c·10^6) / (2·c·10^6)),  avg = R / 10^s
    *
    * with S the exact DECIMAL(30,6) sum (inputs are fixtures with ≤ 6
    * decimal digits) — R is the mathematically-defined HALF_UP rounding
    * of S/c at scale s, identical on any engine; the final int→double
    * division by 10^s is correctly rounded, hence bit-identical too.
    * Valid for non-negative sums (floor == truncation); null when the
    * non-null count is zero, matching AVG.
    */
  def davg(c: Column, scale: Int = 4): Column = {
    val p = math.pow(10, scale).toLong
    // sumExact == SUM(decimal(30,6)) in value AND type, so this is the
    // original decimal-sum formulation with only the aggregate swapped
    val numer = (sumExact(c) * lit(2L * p * 1000000L)).cast("decimal(38,0)") +
      count(c).cast("decimal(38,0)") * lit(1000000L)
    // nullif: a zero non-null count must yield NULL (AVG semantics), and
    // under ANSI mode a zero divisor would otherwise raise
    val denom = nullif(count(c).cast("decimal(38,0)") * lit(2000000L), lit(0).cast("decimal(38,0)"))
    call_function("div", numer, denom).cast("double") / lit(p.toDouble)
  }

  /** [[davg]] for callers that already hold the EXACT micro-unit sum and
    * the pair count — e.g. a window-restructured aggregate that computes
    * Σ micros(x) without ever materializing the per-pair rows. Same
    * integer HALF_UP formula as [[davg]] (numer = 2·p·T + n·10⁶, denom =
    * 2·n·10⁶, floor-div, /10^s), so given T = Σ micros(x) and n =
    * count(x) it is bit-identical to `davg(x)` over the expanded rows.
    */
  def davgOfMicros(totalMicros: Column, n: Column, scale: Int = 4): Column = {
    val p = math.pow(10, scale).toLong
    val numer = totalMicros.cast("decimal(38,0)") * lit(2L * p) +
      n.cast("decimal(38,0)") * lit(1000000L)
    val denom = nullif(n.cast("decimal(38,0)") * lit(2000000L),
      lit(0).cast("decimal(38,0)"))
    call_function("div", numer, denom).cast("double") / lit(p.toDouble)
  }

  /** SQL fragment for the oracle side of [[davg]] (HUGEINT twin). */
  def davgSql(expr: String, scale: Int = 4): String = {
    val p = math.pow(10, scale).toLong
    s"""CASE WHEN COUNT($expr) = 0 THEN NULL ELSE
       CAST((CAST(SUM(CAST($expr AS DECIMAL(30,6))) * 1000000 AS HUGEINT) * ${2 * p}
             + CAST(COUNT($expr) AS HUGEINT) * 1000000)
         // (CAST(COUNT($expr) AS HUGEINT) * 2000000) AS DOUBLE) / $p.0 END"""
  }
}
