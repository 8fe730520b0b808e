package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the engine's EXACT-DECIMAL cosine, one
  * fused pass — bit-identical to the declarative scaffold the DuckDB
  * oracle replays (`Similarity.cosine`):
  *
  *   dot = Σ CAST(a_i·b_i AS DECIMAL(30,15))   (exact, order-independent)
  *   cos = ROUND(dot / (√Σa_i² · √Σb_i²), 6)   (norms summed the same way)
  *
  * Each step mirrors the Spark expression it replaces, digit for digit:
  * the per-product cast is `BigDecimal.valueOf(double)` (shortest decimal
  * representation, what Cast(Double→Decimal) uses) re-scaled HALF_UP to
  * 15, the accumulation is exact decimal addition, the final divide runs
  * in IEEE double, and the 6-dp round is `BigDecimal.valueOf` HALF_UP —
  * the same algorithm as Spark's Round on DoubleType, with its NaN/∞
  * passthrough. A differential test (PropertiesSpec) pins equality
  * against the declarative form on the fixture plus constructed edges.
  *
  * Why native: the declarative form walks each 64-d pair SIX times
  * (three zip_with + three aggregate), every element an interpreted
  * lambda step allocating boxed Decimals; on the bucketed near-dup join
  * (~1M candidate pairs at sf0.1) that interpreter tax dominates the
  * query. One fused walk does 3 BigDecimal adds per element and nothing
  * else. Mismatched dimensions → null (the zip_with null-pad outcome).
  */
case class ExactCosine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_exact expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_exact"

  private def dec15(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(15, RoundingMode.HALF_UP)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // zip_with pads the shorter side with null → null product → null sum:
    // the declarative scaffold yields null on any length mismatch
    if (n != y.numElements()) return null
    var dot = JBigDecimal.ZERO
    var na = JBigDecimal.ZERO
    var nb = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      // null ELEMENTS never occur here (the arrays are cast from parquet
      // float vectors); isNullAt guard kept for contract completeness
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot = dot.add(dec15(xi * yi))
      na = na.add(dec15(xi * xi))
      nb = nb.add(dec15(yi * yi))
      i += 1
    }
    val denom = math.sqrt(na.doubleValue()) * math.sqrt(nb.doubleValue())
    // zero-norm input → null, NOT NaN: NaN compares GREATER than every
    // double in Spark's ordering, so a NaN cosine would silently TOP any
    // descending similarity ranking; null sorts last and drops from
    // threshold filters. (The declarative form throws under ANSI here;
    // no fixture vector is zero-norm, so oracle parity is unaffected.)
    if (denom == 0.0) return null
    val c = dot.doubleValue() / denom
    // Spark Round(double, 6): NaN/∞ pass through, else BigDecimal HALF_UP
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) c
    else JBigDecimal.valueOf(c).setScale(6, RoundingMode.HALF_UP).doubleValue()
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ExactCosine]] as a Column (direct construction). */
object ExactCosineCol {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ExactCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Native Catalyst expression: the DOT-PRODUCT term of [[ExactCosine]]
  * alone — Σ CAST(a_i·b_i AS DECIMAL(30,15)) as a DECIMAL(30,15) value,
  * null on dimension mismatch or null elements (the zip_with outcomes).
  *
  * Why it exists: [[ExactCosine]] spends two thirds of its BigDecimal
  * work on the two SELF-norms Σa_i² and Σb_i², which depend on one
  * vector each — a pairwise operator evaluating m pairs over n vectors
  * (the kNN graph: m ≈ n·bucket-width) recomputes each vector's norm
  * once per PAIR instead of once per VECTOR. Factoring the norms out
  * (`ExactDotDec(e, e)` per vector, joined back to the pairs) leaves one
  * decimal chain per pair instead of three — bit-identical by
  * construction, because exact DECIMAL addition is order- AND
  * grouping-independent, and [[graft.operators.Similarity.cosineFromParts]]
  * reassembles the identical final arithmetic (double divide, 6-dp
  * HALF_UP round, zero-norm → null). PropertiesSpec pins the
  * factored == fused equality on fixture pairs.
  */
case class ExactDotDec(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_exact_dec expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DecimalType(30, 15)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_exact_dec"

  private def dec15(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(15, RoundingMode.HALF_UP)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot = dot.add(dec15(x.getDouble(i) * y.getDouble(i)))
      i += 1
    }
    org.apache.spark.sql.types.Decimal(dot, 30, 15)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ExactDotDec]] as a Column (direct construction). */
object ExactDotDecCol {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ExactDotDec(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
