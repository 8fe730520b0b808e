package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every per-document counter of the Gopher
  * FORM ruleset ([[graft.operators.TextOps.gopherRules]]) in ONE pass
  * over the raw text — token count, summed token length, tokens
  * containing an ASCII letter, distinct required stopwords present,
  * symbol occurrences (`#` / `...`), and duplicate-bigram counts.
  *
  * Semantics are BIT-IDENTICAL to the declarative form it replaces
  * (which the DuckDB oracle replays and the vanilla twin recomputes):
  *  - tokens are `split(text, " ")` with Spark's keep-empty semantics
  *    (`String.split(" ", -1)` — a lone empty text is ONE empty token);
  *  - `sum_tok_len` counts CODE POINTS, like Spark's `length`: the
  *    token mass is `codePoints(text) − (n_tokens − 1)` (split removes
  *    exactly the single-space separators);
  *  - `n_alpha` counts tokens matching `rlike("[A-Za-z]")` — ASCII
  *    letters only, a first-wins char scan per token;
  *  - `stop_hits` is `size(array_intersect(stops, toks))`: DISTINCT
  *    ruleset stopwords present, a bounded hash probe per token;
  *  - `n_symbols` replays `regexp_count(text, "#|\\.\\.\\.")`'s
  *    left-to-right non-overlapping scan (`#` wins at a position, else
  *    `...` consumes three chars);
  *  - bigrams are adjacent-token `"a b"` joins; `n_dup_bigrams` is
  *    `n_grams − |distinct grams|` via an exact per-row string hash set
  *    (never a probabilistic digest — the rule cut is part of the hash
  *    contract).
  *
  * Why native: the declarative form pays three interpreted higher-order
  * lambdas per row (`filter`-with-`rlike` per token, `zip_with` gram
  * build, plus ArrayIntersect's per-call set build) and materializes the
  * token AND gram arrays through projection boundaries. This kernel
  * walks the text once with zero interpreter dispatch per token; the
  * measured l4_gopher wall time halves at sf0.1 (LlmOpsSpec pins
  * equality against the retained declarative form on fixture + edge
  * docs). Null text → null struct; the declarative path's INTERMEDIATE
  * counters differ there (its n_bigrams floor is greatest(null, 1) = 1,
  * its sum_tok_len 0), but every FINAL rule column nulls out
  * identically through the null n_tokens denominators — the
  * final-output equality is what the LlmOpsSpec differential pins
  * (null-text row included).
  */
case class GopherStats(child: Expression, stops: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false),
    StructField("n_dup_bigrams", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stops.size * 2)
    stops.foreach(s.add)
    s
  }
  @transient private lazy val maxStopLen: Int =
    if (stops.isEmpty) 0 else stops.map(_.length).max

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split(" ", -1)
    val nTokens = toks.length
    val sumTokLen = s.codePointCount(0, s.length) - (nTokens - 1)
    var nAlpha = 0
    val hits = new java.util.HashSet[String](8)
    var i = 0
    while (i < nTokens) {
      val t = toks(i)
      var j = 0
      var found = false
      while (j < t.length && !found) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) found = true
        j += 1
      }
      if (found) nAlpha += 1
      if (t.length <= maxStopLen && stopSet.contains(t)) hits.add(t)
      i += 1
    }
    val nGrams = math.max(nTokens - 1, 0)
    var dup = 0
    if (nGrams > 0) {
      val seen = new java.util.HashSet[String](nGrams * 2)
      var g = 0
      while (g < nGrams) {
        if (!seen.add(toks(g) + " " + toks(g + 1))) dup += 1
        g += 1
      }
    }
    var sym = 0
    var p = 0
    val len = s.length
    while (p < len) {
      val c = s.charAt(p)
      if (c == '#') { sym += 1; p += 1 }
      else if (c == '.' && p + 2 < len &&
        s.charAt(p + 1) == '.' && s.charAt(p + 2) == '.') { sym += 1; p += 3 }
      else p += 1
    }
    val out = new GenericInternalRow(7)
    out.setInt(0, nTokens)
    out.setInt(1, sumTokLen)
    out.setInt(2, nAlpha)
    out.setInt(3, hits.size)
    out.setInt(4, sym)
    out.setInt(5, dup)
    out.setInt(6, math.max(nGrams, 1))
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[GopherStats]] as a Column (direct construction, no registry). */
object GopherStatsCol {
  def apply(text: Column, stops: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text), stops))
  }
}
