package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A8 (beyond §2.4): bounded-memory frequent-items sketch — a mergeable
  * Misra–Gries summary as a typed Catalyst `Aggregator`.
  *
  * The summary holds at most `capacity` (item → weight) entries no matter
  * how many rows or distinct items flow through it — THE reason to use it
  * at 100 TB, where an exact `groupBy(item).count` over a high-cardinality
  * column shuffles the full domain while this sketch ships one
  * `capacity`-entry map per partition into partial/final aggregation.
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - every reported weight UNDERCOUNTS its item's true frequency by at
  *    most n/(capacity+1), where n = total rows aggregated;
  *  - every item with true frequency > n/(capacity+1) is present —
  *    regardless of partitioning or merge order;
  *  - when the column's distinct count is ≤ capacity, no decrement ever
  *    fires, so every count is EXACT and the result is partitioning- and
  *    merge-order-independent. The declared query pins that regime
  *    (25 brands under a 32-slot sketch) so a DuckDB `GROUP BY` oracle
  *    can hash-compare it; the under-capacity bounds are property-tested
  *    in PropertiesSpec across shuffled partitionings.
  */
class FreqItemsAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity >= 1, s"bad capacity: $capacity")

  override def zero: Map[String, Long] = Map.empty

  /** Classic per-row update: hit → increment; room → insert at 1; full →
    * decrement every counter (dropping zeros), which "charges" the new
    * item and capacity other items one occurrence each.
    */
  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) b
    else b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None =>
        b.iterator.map { case (k, c) => k -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  /** Mergeable-summaries rule: sum weights key-wise; if over capacity,
    * subtract the (capacity+1)-th largest weight from every entry and
    * drop the non-positive ones — the error each input summary carried
    * adds, so the merged bound stays n_total/(capacity+1).
    */
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      summed.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Deterministic surface order: weight desc, then item — so the exact
    * (under-capacity) regime is hash-comparable.
    */
  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object FreqItems {

  /** Capacity for the declared query: above the 25-brand domain, so the
    * sketch is in its exact regime and the GROUP BY oracle applies.
    */
  val QueryCapacity = 32

  /** A8 declared query: brand frequencies via the sketch, exploded to
    * (item, cnt) rows. Full tie-break: cnt desc then item.
    */
  def a8FreqItems(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val fi = udaf(new FreqItemsAgg(QueryCapacity), Encoders.STRING)
    t.part
      .agg(fi(col("p_brand")).as("items"))
      .select(explode(col("items")).as("kv"))
      .select(col("kv._1").as("item"), col("kv._2").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
