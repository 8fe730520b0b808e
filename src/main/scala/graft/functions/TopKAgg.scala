package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing through [[TopKAgg]]. Ranked ASCENDING by
  * `(s, id)` — a caller wanting descending score order passes the negated
  * score as `s` and keeps the original in `payload`. `payload`/`tag`/`tag2`
  * are opaque rider fields for whatever the caller needs downstream
  * (original cosine, label, IVF cell, …).
  */
case class ScoredRow(s: Double, id: Long, payload: Double, tag: Long, tag2: Long)

/** Bounded per-group top-k as a mergeable typed `Aggregator` — the
  * partial-aggregation answer to "rank a corpus-sized candidate set per
  * query, keep k".
  *
  * Why not a rank? Both alternatives pay corpus-scale data movement for a
  * k-row answer:
  *  - `Window.partitionBy(query)` funnels each query's full candidate set
  *    through ONE task (the skew the per-query-window ban in SURVEY §5
  *    exists for);
  *  - [[graft.operators.Relational.distributedRank]] is shaped right for
  *    FULL rankings (equi-depth buckets, CCNet cuts) but costs a range
  *    exchange of the whole scored frame, a materialize, and an offset
  *    join — wasted when all but k rows per query are discarded.
  *
  * This aggregator keeps an O(k) sorted buffer per (group × partition),
  * map-side combines it (`ObjectHashAggregate` partial merge), and ships
  * only ≤ k rows per group per input partition into the final merge: the
  * one corpus pass stays narrow and the shuffle is `groups · partitions ·
  * k` structs no matter how large the scored frame is. At 100 TB that is
  * the difference between "exchange the scored corpus twice" and
  * "exchange kilobytes".
  *
  * Determinism: the buffer is totally ordered by `(s, id)` (ids are
  * unique per group in every caller), so the result is independent of row
  * arrival and partial-merge order — the same guarantee the Misra–Gries
  * sketch ([[FreqItemsAgg]]) documents, here exact rather than
  * approximate. `Ordering[Double]` is the same total order Spark's sort
  * uses (−0.0 < 0.0, NaN greatest), so a negated-score caller sees
  * Spark's `desc` tie behavior for signed zeros; NaN scores cannot reach
  * the callers (cosine/ADC distances are finite-or-NULL, and NULLs are
  * filtered before the aggregate, which a typed input could not represent).
  */
class TopKAgg(k: Int) extends Aggregator[ScoredRow, List[ScoredRow], Seq[ScoredRow]] {
  require(k >= 1, s"bad k: $k")

  private val ord: Ordering[ScoredRow] = Ordering.by((r: ScoredRow) => (r.s, r.id))

  override def zero: List[ScoredRow] = Nil

  /** Buffer invariant: sorted ascending by `(s, id)`, length ≤ k — so the
    * common reject path (row worse than the current k-th) is an O(1)
    * comparison against the buffer tail once the buffer is warm.
    */
  override def reduce(b: List[ScoredRow], r: ScoredRow): List[ScoredRow] =
    if (b.lengthCompare(k) >= 0 && ord.gteq(r, b.last)) b
    else {
      val (before, after) = b.span(x => ord.lt(x, r))
      (before ::: r :: after).take(k)
    }

  /** Merge of two sorted bounded buffers: linear interleave, truncate. */
  override def merge(x: List[ScoredRow], y: List[ScoredRow]): List[ScoredRow] = {
    val out = List.newBuilder[ScoredRow]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && ord.lteq(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else { out += ys.head; ys = ys.tail }
      n += 1
    }
    out.result()
  }

  /** Ascending `(s, id)` — position in the sequence IS rank−1. */
  override def finish(b: List[ScoredRow]): Seq[ScoredRow] = b

  override def bufferEncoder: Encoder[List[ScoredRow]] =
    ExpressionEncoder[List[ScoredRow]]()
  override def outputEncoder: Encoder[Seq[ScoredRow]] =
    ExpressionEncoder[Seq[ScoredRow]]()
}

object TopK {
  /** The aggregator as a DataFrame UDAF: call with the five [[ScoredRow]]
    * field columns `(s, id, payload, tag, tag2)`; yields
    * `array<struct<s,id,payload,tag,tag2>>` sorted ascending by `(s, id)`.
    */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), ExpressionEncoder[ScoredRow]())
}
