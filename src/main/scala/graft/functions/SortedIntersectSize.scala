package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT arrays
  * (both `array<string>` or both `array<bigint>`), by a single linear
  * merge walk — the verification kernel of the near-dup similarity join
  * (string shingle sets) and of the adjacency-intersection triangle
  * closure (long neighbor lists, `Graph.triangleStats`).
  *
  * Why native: the declarative `size(array_intersect(a, b))` builds a
  * hash set per CALL, interpreted (ArrayIntersect is CodegenFallback on
  * this path) — on a corpus where LSH verification is the dominant cost
  * (the sf0.1 fixture verifies ~700k candidate rep pairs), per-pair set
  * construction and boxed hashing dwarf the actual comparisons. The merge
  * walk does |A|+|B| UTF8String compares with zero allocation and
  * participates in whole-stage codegen. Interpreted eval and generated
  * code are the same algorithm, bit-for-bit.
  *
  * Inputs MUST be ascending-sorted and duplicate-free (the caller sorts
  * once per SET REPRESENTATIVE, amortized over all its pairs — never per
  * pair). UTF8String.compareTo is binary (byte-wise unsigned) order, the
  * same order array_sort applies (and long order trivially agrees); on
  * unsorted input the count is undefined, so the caller contract is
  * asserted in LlmOpsSpec against the array_intersect reference. Null
  * arrays → null; null ELEMENTS are not permitted by the caller
  * (array_distinct of split output / collect_list of non-null ids).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongs: Boolean =
    left.dataType match { case ArrayType(LongType, _) => true; case _ => false }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) => true
      case _ => false
    }) && DataType.equalsIgnoreNullability(left.dataType, right.dataType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_size expects matching (array<string>, array<string>) " +
        s"or (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    if (isLongs) {
      while (i < nx && j < ny) {
        val cmp = java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nx, ny, i, j, c, cmp) = (ctx.freshName("nx"), ctx.freshName("ny"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("cmp"))
      val cmpExpr =
        if (isLongs) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0, $j = 0, $c = 0;
        while ($i < $nx && $j < $ny) {
          int $cmp = $cmpExpr;
          if ($cmp == 0) { $c++; $i++; $j++; }
          else if ($cmp < 0) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectSize]] as a Column (direct construction). */
object SortedIntersectSizeCol {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
