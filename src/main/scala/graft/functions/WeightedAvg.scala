package graft.functions

import graft.Tables
import java.math.{BigDecimal => JBigDecimal}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A7 (SURVEY.md §2.4): custom typed UDAF — numerically stable weighted
  * average via a Catalyst `Aggregator`.
  *
  * Input rows are (weighted value, weight) already cast to DECIMAL by the
  * caller, so the buffer accumulates EXACT decimal sums — merge order
  * (partial aggregation across partitions, AQE re-splits) cannot change
  * the result, which is what makes the oracle hash-compare possible and
  * what a 1000-executor partial/final aggregate requires. The single
  * double division happens once, at finish.
  */
object WeightedAvgAgg
    extends Aggregator[(JBigDecimal, JBigDecimal), (JBigDecimal, JBigDecimal), Double] {

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal),
                      a: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    if (a._1 == null || a._2 == null) b
    else (b._1.add(a._1), b._2.add(a._2))

  override def merge(x: (JBigDecimal, JBigDecimal),
                     y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  /** Exact HALF_UP at 4 dp: BigDecimal's rational division rounds the
    * exact quotient once, with a defined mode, for any sign — a double
    * division here could land exactly on a half-boundary where engines
    * round differently (see [[graft.Det.davg]]). The final ×10⁻⁴-scale
    * decimal → double conversion is correctly rounded.
    */
  override def finish(r: (JBigDecimal, JBigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN
    else r._1.divide(r._2, 4, java.math.RoundingMode.HALF_UP).doubleValue

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedAvg {

  /** A7 declared query: quantity-weighted average extended price per
    * return flag, via the registered UDAF. The decimal casts mirror the
    * oracle's exactly ([[graft.Det]] discipline).
    */
  def a7WeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wavg = udaf(WeightedAvgAgg,
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL))
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        wavg(
          (col("l_extendedprice") * col("l_quantity")).cast("decimal(30,12)"),
          col("l_quantity").cast("decimal(30,12)")).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }
}
