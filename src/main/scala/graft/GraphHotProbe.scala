package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: loop the pagerank round's hot aggregation for ~30 s so
  * an external `jcmd <pid> Thread.print` can sample where task CPU goes.
  * Usage: tools/run.sh graft.GraphHotProbe [sfDir] [loops]
  */
object GraphHotProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val loops = if (args.length > 1) args(1).toInt else 60
    val spark = Engine.session("graft-ghot-probe")
    val t = Tables(spark, sfDir)
    val flows = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct().persist()
    val edges = flows.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(flows.select(col("c").as("src"), col("s").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val linked = edges.join(deg, "src").repartition(col("src")).persist()
    println(s"[ghot] linked rows = ${linked.count()} pid=${ProcessHandle.current().pid()}")
    val q = linked.groupBy(col("dst")).agg(sum(col("d")))
    val t0 = System.nanoTime()
    for (i <- 1 to loops) q.write.format("noop").mode("overwrite").save()
    println(f"[ghot] $loops loops in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"(${(System.nanoTime() - t0) / 1e9 / loops}%.3f s/loop)")
    spark.stop()
  }
}
