package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: re-measures the VANILLA-Spark baseline twins of the four
  * headline bench queries in the BASELINE.md environment (local[4],
  * shuffle.partitions=4, UTC, nanosAsLong — idiomatic Spark, no graft
  * operators or hints), reporting warm best-of-3 under BOTH actions:
  * `count()` (the round-1 measurement, which lets Catalyst prune agg
  * expressions and eliminate final sorts) and a noop-sink write (full
  * materialization of every output column). BASELINE.md records both;
  * Bench and the baseline must always be compared under the SAME action.
  */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("vanilla-baseline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li   = spark.read.parquet(s"$dir/lineitem.parquet")
    def cust = spark.read.parquet(s"$dir/customer.parquet")
    def ord  = spark.read.parquet(s"$dir/orders.parquet")
    def ev   = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    val queries: Seq[(String, () => DataFrame)] = Seq(
      "q1_pricing_summary" -> (() => li
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"), avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"), count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
      "q3_join_agg" -> (() => {
        val cutoff = lit("1995-03-15").cast("timestamp")
        cust.filter(col("c_mktsegment") === "BUILDING")
          .join(ord, col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < cutoff)
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > cutoff)
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      }),
      "window_topk" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
        ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("user_id"), col("event_id"), col("value"), col("rn"))
          .orderBy("user_id", "rn")
      }),
      "tumbling_window" -> (() => ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), avg("value").as("avg_value"))
        .orderBy(col("window").getField("start"), col("event_type"))))
    val rows = for ((name, q) <- queries) yield {
      q().write.format("noop").mode("overwrite").save() // warm
      def best(act: DataFrame => Unit) = (1 to 3).map { _ =>
        val t = System.nanoTime(); act(q()); (System.nanoTime() - t) / 1e9 }.min
      val c = best(df => { df.count(); () })
      val n = best(_.write.format("noop").mode("overwrite").save())
      println(f"$name%-22s count=$c%.3f noop=$n%.3f")
      (name, c, n)
    }
    println(f"TOTAL count=${rows.map(_._2).sum}%.3f noop=${rows.map(_._3).sum}%.3f")
    spark.stop()
  }
}
