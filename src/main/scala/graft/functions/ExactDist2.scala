package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType}

/** Native Catalyst expression: exact-DECIMAL squared L2 distance,
  * Σ CAST((a_i−b_i)² AS DECIMAL(30,15)) — the fused twin of the
  * declarative `dsumArr(zip_with(a, b, (x,y) => (x−y)·(x−y)))` scaffold
  * the IVF quantizer and its DuckDB oracle replay (assignment argmin,
  * centroid rank). Returns the SAME DecimalType(30,15), so downstream
  * min-by-(d2, cid) tie-breaks and orderBys compare identical values.
  *
  * Per element this mirrors Spark Cast(Double→Decimal(30,15)):
  * `BigDecimal.valueOf(double)` (shortest decimal form) re-scaled
  * HALF_UP to 15; accumulation is exact decimal addition. Why native:
  * the declarative form is two interpreted HOF walks with boxed Decimal
  * allocation per element, paid once per (vector, centroid) pair in
  * every Lloyd round and every probe — the k-means inner loop.
  * Mismatched dimensions → null (the zip_with null-pad outcome).
  */
case class ExactDist2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dist2_exact expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DecimalType(30, 15)
  override def nullable: Boolean = true
  override def prettyName: String = "dist2_exact"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc = acc.add(
        JBigDecimal.valueOf(d * d).setScale(15, RoundingMode.HALF_UP))
      i += 1
    }
    Decimal(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ExactDist2]] as a Column (direct construction). */
object ExactDist2Col {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ExactDist2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
