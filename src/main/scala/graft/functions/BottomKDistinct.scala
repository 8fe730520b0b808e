package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded DISTINCT bottom-k of a string column as a mergeable typed
  * `Aggregator` — the k-minimum-values (KMV) sketch primitive behind
  * corpus-level set-overlap estimation ([[graft.operators.Eval]] M9).
  *
  * Why not `SELECT DISTINCT h ORDER BY h LIMIT k`? The global distinct
  * exchanges every distinct value (the gram universe — corpus-scale),
  * then a single-partition sort takes the limit. This aggregator keeps
  * the DISTINCT inside the bound: each partition's buffer is a sorted
  * distinct list of ≤ k strings, map-side combined, so the only exchange
  * is `groups · partitions · k` short strings no matter how many grams
  * the corpus holds — the same "exchange kilobytes, not the corpus"
  * shape as [[TopKAgg]], plus dedup on insert (KMV is a sketch of a SET;
  * a duplicate hash must not occupy two of the k slots).
  *
  * Determinism: the buffer is totally ordered by `String.compareTo` —
  * UTF-16 code-unit order, which coincides with UTF-8 byte order (what
  * Spark's `array_sort`/comparisons and DuckDB's VARCHAR order use) for
  * ASCII input but NOT for all of Unicode (supplementary characters sort
  * below some BMP code points in byte order). Callers wanting
  * cross-engine agreement must feed ASCII values — the M9 callers hash
  * every gram to lowercase-hex md5 first, which also makes the k-th
  * value a uniform order statistic (the KMV requirement). Dedup + bound
  * are arrival- and merge-order independent, so the result is a pure
  * function of the input SET. NULL inputs are skipped (an absent gram
  * contributes nothing).
  */
class BottomKDistinctAgg(k: Int) extends Aggregator[String, List[String], Seq[String]] {
  require(k >= 1, s"bad k: $k")

  override def zero: List[String] = Nil

  /** Buffer invariant: sorted ascending, distinct, length ≤ k — the
    * common reject path (value ≥ current k-th with a full buffer) is one
    * comparison against the buffer tail.
    */
  override def reduce(b: List[String], v: String): List[String] =
    if (v == null) b
    else if (b.lengthCompare(k) >= 0 && v.compareTo(b.last) >= 0) b
    else {
      val (before, after) = b.span(_.compareTo(v) < 0)
      if (after.nonEmpty && after.head == v) b
      else (before ::: v :: after).take(k)
    }

  /** Merge of two sorted distinct bounded buffers: linear interleave,
    * skipping equal heads, truncate at k.
    */
  override def merge(x: List[String], y: List[String]): List[String] = {
    val out = List.newBuilder[String]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty) { out += xs.head; xs = xs.tail }
      else if (xs.isEmpty) { out += ys.head; ys = ys.tail }
      else {
        val c = xs.head.compareTo(ys.head)
        if (c < 0) { out += xs.head; xs = xs.tail }
        else if (c > 0) { out += ys.head; ys = ys.tail }
        else { out += xs.head; xs = xs.tail; ys = ys.tail } // equal: emit once
      }
      n += 1
    }
    out.result()
  }

  override def finish(b: List[String]): Seq[String] = b

  override def bufferEncoder: org.apache.spark.sql.Encoder[List[String]] =
    ExpressionEncoder[List[String]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object BottomKDistinct {
  /** The aggregator as a DataFrame UDAF: call with one string column;
    * yields `array<string>` — the k smallest distinct values, ascending.
    */
  def bottomKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKDistinctAgg(k),
      ExpressionEncoder[String]())
}
