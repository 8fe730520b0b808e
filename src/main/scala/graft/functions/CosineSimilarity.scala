package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * This is the PRODUCTION path for similarity search (the declared L3
  * queries use the slower exact-DECIMAL formulation because the DuckDB
  * oracle must reproduce every bit): a fused single pass over both
  * arrays with primitive `getFloat` access and no boxing, participating
  * in whole-stage codegen — at 100 TB the scan stays one codegen'd stage
  * instead of breaking into interpreted higher-order-function calls.
  * Interpreted eval and generated code compute the identical double
  * arithmetic, so plans with and without codegen agree bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_fast expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on dimension mismatch
  override def prettyName: String = "cosine_fast"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // mismatched dimensions → null (like the exact zip_with path), never a
    // plausible-but-wrong prefix cosine that masks a data bug
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xa = x.getFloat(i).toDouble
        val xb = y.getFloat(i).toDouble
        dot += xa * xb; na += xa * xa; nb += xb * xb
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i) = (ctx.freshName("dot"), ctx.freshName("na"),
        ctx.freshName("nb"), ctx.freshName("n"), ctx.freshName("i"))
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double xa = (double) $a.getFloat($i);
            double xb = (double) $b.getFloat($i);
            $dot += xa * xb; $na += xa * xa; $nb += xb * xb;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[CosineSimilarity]] as a Column, constructed directly (no session
  * function-registry lookup) — usable under any SparkSession.
  */
object CosineFast {
  def apply(a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** SparkSessionExtensions hook registering the engine's native functions —
  * `spark.sql.extensions=graft.functions.GraftExtensions` (set by
  * [[graft.Engine.session]]) makes `cosine_fast(a, b)` available to SQL
  * and `expr(...)` users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_fast"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_fast"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_fast expects exactly 2 arguments (array<float>, array<float>), got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sum_micros_fixed"),
      new ExpressionInfo(classOf[FixedPointSum].getName, "sum_micros_fixed"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"sum_micros_fixed expects exactly 1 BIGINT argument, got ${children.length}")
        FixedPointSum(children.head).toAggregateExpression()
      }))
    def intLit(e: Expression, what: String): Int = e match {
      case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
        l.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"minhash_sigs expects (array<string> tokens, int numHashes), got ${children.length} args")
        MinhashSigs(children.head, intLit(children(1), "minhash_sigs numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"simhash_sig expects (array<string> tokens, int bits), got ${children.length} args")
        SimhashSig(children.head, intLit(children(1), "simhash_sig bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sorted_intersect_size expects 2 array<string> arguments, got ${children.length}")
        SortedIntersectSize(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_exact"),
      new ExpressionInfo(classOf[ExactCosine].getName, "cosine_exact"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_exact expects 2 array<double> arguments, got ${children.length}")
        ExactCosine(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dist2_exact"),
      new ExpressionInfo(classOf[ExactDist2].getName, "dist2_exact"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dist2_exact expects 2 array<double> arguments, got ${children.length}")
        ExactDist2(children.head, children(1))
      }))
  }
}
