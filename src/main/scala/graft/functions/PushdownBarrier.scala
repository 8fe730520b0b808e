package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that Catalyst must treat as NON-DETERMINISTIC — an
  * explicit predicate-pushdown barrier (guide §4.4's asNondeterministic
  * trick, expression-tree form).
  *
  * Why it exists: the optimizer pushes deterministic filters below
  * `Repartition`, so a `parallelFloor(df).filter(expensivePredicate)`
  * silently evaluates the predicate in the single-task scan stage the
  * floor was added to escape (measured: the l9 bloom probe ran 0.7 s
  * serially below its floor exchange while the floored stage sat idle).
  * Wrapping the predicate keeps it ABOVE the exchange. The wrapped value
  * is computed identically (same child, bit-for-bit identity, one
  * evaluation per row) — only the optimizer's freedom to move/duplicate
  * it is withdrawn, exactly the trade the guide describes. Use ONLY on
  * predicates whose placement matters; a barrier also blocks pushing
  * OTHER filters past it.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrierCol {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PushdownBarrier(ColumnBridge.expression(c)))
  }
}
