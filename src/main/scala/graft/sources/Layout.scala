package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional write-time clustering: Z-order (Morton-curve)
  * layout. At 100 TB the scan you never do is the cheapest optimization
  * there is — parquet keeps min/max statistics per row group (and per
  * page, via the column index), and the reader skips any group a pushed
  * predicate proves empty. Those stats are only selective if rows
  * arrive CLUSTERED: a plain sort makes them tight on its leading column
  * alone, while interleaving the bits of several columns keeps every
  * row group confined to a small hyper-rectangle of the combined
  * domain, so a filter on ANY layout dimension skips most of the file.
  * IOSpec measures exactly that skip on the scan's own row counter.
  */
object Layout {

  /** Morton interleave of already-normalized inputs: bit `i` of column
    * `j` lands at position `i * N + j`, giving all N columns equal stat
    * resolution — which is only true if each input actually spans
    * [0, 2^bits). Callers with real domains use [[zValueScaled]]; an
    * unscaled narrow column (a 10-value key under 16-bit interleave)
    * contributes only dead low bits and gets NO clustering benefit.
    * Pure codegen'd bitwise built-ins, 2·N·`bits` expression nodes,
    * no UDF.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && n * bits <= 63, s"bad z-order shape: $n cols x $bits bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** [[zValue]] over raw columns: each is first mapped monotonically from
    * its [lo, hi] range onto [0, 2^bits). The interleave stays exact
    * through a double intermediate as long as (hi−lo)·2^bits < 2^53 —
    * enforced — and rows outside the declared range clamp to the
    * endpoints (stats stay valid; clustering quality just degrades for
    * outliers).
    */
  def zValueScaled(cols: Seq[(Column, (Long, Long))], bits: Int = 16): Column = {
    val m = (1L << bits) - 1
    val scaled = cols.map { case (c, (lo, hi)) =>
      require(hi >= lo && (BigInt(hi) - BigInt(lo)) * m < (1L << 53),
        s"z-order range [$lo, $hi] too wide for $bits-bit scaling")
      val d = math.max(1L, hi - lo)
      val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
      floor(((clamped - lit(lo)) * lit(m)).cast("double") / lit(d.toDouble)).cast("long")
    }
    zValue(scaled, bits)
  }

  /** Z-ordered parquet write: range-partition on the scaled z-value —
    * each output file covers a compact, disjoint slice of the curve —
    * then sort within partitions so row-group min/max stats stay tight
    * on every layout dimension at once. Ranges for columns absent from
    * `ranges` are computed in one extra min/max pass over `df`; at real
    * scale pass them in from table-level stats (or a
    * [[graft.operators.Profile]] run) and the write stays single-pass.
    * `rowGroupBytes`/`pageBytes` bound stat granularity (the parquet
    * defaults are right at scale; specs shrink them so the fixture
    * produces enough groups to measure skipping).
    */
  def writeZOrdered(df: DataFrame, layoutCols: Seq[String], path: String,
                    partitions: Int, bits: Int = 16,
                    rowGroupBytes: Long = 128L << 20,
                    pageBytes: Long = 1L << 20,
                    ranges: Map[String, (Long, Long)] = Map.empty): Unit = {
    val missing = layoutCols.filterNot(ranges.contains)
    val computed: Map[String, (Long, Long)] =
      if (missing.isEmpty) Map.empty
      else {
        val aggs = missing.flatMap(c =>
          Seq(min(col(c)).cast("long").as(s"__lo_$c"), max(col(c)).cast("long").as(s"__hi_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        missing.map(c => c -> (r.getAs[Long](s"__lo_$c"), r.getAs[Long](s"__hi_$c"))).toMap
      }
    val all = ranges ++ computed
    val z = zValueScaled(layoutCols.map(c => col(c) -> all(c)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.option("parquet.block.size", rowGroupBytes.toString)
      .option("parquet.page.size", pageBytes.toString)
      .mode("overwrite").parquet(path)
  }
}
