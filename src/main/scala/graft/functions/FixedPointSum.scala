package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BitwiseAnd, Expression, If, IsNull, Literal, ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact order-independent fixed-point SUM over long micro-units — the
  * fast twin of `sum(cast(x as decimal(30,6)))` for the [[graft.Det]]
  * money discipline.
  *
  * Spark's decimal sum pays 128-bit decimal adds with per-row overflow
  * checks in the aggregation buffer — measured at ~2.5× the whole-query
  * cost of q1's vanilla double sums at sf0.1. A plain `sum(long)` over
  * micros is fast but overflows a 100 TB per-group sum (~1e22 µ ≫ 2^63).
  * This aggregate keeps LONG-width arithmetic AND decimal-width
  * capacity by accumulating in two long limbs:
  *
  *   lo ∈ [0, 2^61)  — low 61 bits;   hi — signed high limb
  *   total = hi · 2^61 + lo           (capacity ±2^124 µ ≈ ±2e31 units,
  *                                     the same headroom as DECIMAL(38,6))
  *
  * update: split the row value m into (m >> 61, m & mask) — the
  * arithmetic shift sign-extends, so negative values accumulate
  * correctly through the signed high limb — then add limb-wise with one
  * carry. Every intermediate stays well inside long range BY
  * CONSTRUCTION (lo + mLo < 2^62), so ANSI overflow checks pass and the
  * expressions codegen to 4–5 primitive long ops per row. merge is the
  * same limb add; evaluate reconstructs hi·2^61 + lo in DECIMAL(38,0)
  * once per group (NULL when no non-null input, like SUM).
  *
  * Exactness: integer limb addition is associative and commutative, so
  * the result is independent of partial-aggregation order, AQE
  * re-splits, and retries — the same guarantee as the decimal sum it
  * replaces, verified bit-for-bit by every Det-using oracle query.
  */
case class FixedPointSum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val LimbBits = 61
  private val LimbMask = (1L << LimbBits) - 1

  override def dataType: DataType = DecimalType(38, 6)
  override def nullable: Boolean = true
  override def prettyName: String = "sum_micros_fixed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sum_micros_fixed expects BIGINT micros, got ${child.dataType.simpleString}")

  private lazy val hi  = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo  = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  /** (newHi, newLo) after adding the (mHi, mLo) limbs of one addend. */
  private def limbAdd(curHi: Expression, curLo: Expression,
                      mHi: Expression, mLo: Expression): (Expression, Expression) = {
    val rawLo = org.apache.spark.sql.catalyst.expressions.Add(curLo, mLo)
    val carry = ShiftRightUnsigned(rawLo, Literal(LimbBits))
    val newLo = BitwiseAnd(rawLo, Literal(LimbMask))
    val newHi = org.apache.spark.sql.catalyst.expressions.Add(
      org.apache.spark.sql.catalyst.expressions.Add(curHi, mHi), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // UNCONDITIONAL updates with null → zero contribution: wrapping the
    // limb math in If(IsNull(child), …) would place the (potentially
    // expensive) child subtree under conditional branches, which defeats
    // codegen subexpression elimination and re-evaluates it per buffer
    // slot — measured 4× slower with a decimal-cast child. A null row
    // adds (0, 0) limbs (a no-op) and 0 to cnt.
    val m = org.apache.spark.sql.catalyst.expressions.Coalesce(
      Seq(child, Literal(0L)))
    val (newHi, newLo) = limbAdd(hi, lo,
      ShiftRight(m, Literal(LimbBits)), BitwiseAnd(m, Literal(LimbMask)))
    Seq(newHi, newLo,
      org.apache.spark.sql.catalyst.expressions.Add(cnt,
        If(IsNull(child), Literal(0L), Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = limbAdd(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo,
      org.apache.spark.sql.catalyst.expressions.Add(cnt.left, cnt.right))
  }

  /** The result is the decimal VALUE (units, scale 6) — the same
    * DECIMAL(38,6) a `sum(cast(x as decimal(30,6)))` buffer yields — so
    * callers' rounding/averaging tails are untouched by the limb rewrite
    * and no post-hoc ÷10⁶ (whose decimal-division type coercion would
    * silently narrow at extreme magnitudes) is ever needed:
    *
    *  - the lo limb converts EXACTLY via MakeDecimal (unscaled long →
    *    decimal(20,6), i.e. lo·10⁻⁶ — lo < 2^61 always fits);
    *  - the hi limb multiplies by the 6-dp literal 2^61·10⁻⁶ =
    *    2305843009213.693952 — an integer times a 6-dp value has ≤ 6 dp,
    *    so the decimal(38,6) product is exact across the full ±2^124 µ
    *    range (|hi·2^61 µ| < 2.1e31 units < the 32 integer digits
    *    decimal(38,6) holds).
    */
  override lazy val evaluateExpression: Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Cast, EqualTo, MakeDecimal, Multiply}
    val limbUnits = Decimal(BigDecimal(1L << LimbBits) / 1000000L)
    val total = Add(
      Multiply(Cast(hi, DecimalType(38, 6)),
        Literal(limbUnits, DecimalType(19, 6))),
      MakeDecimal(lo, 20, 6))
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, DecimalType(38, 6)), Cast(total, DecimalType(38, 6)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
