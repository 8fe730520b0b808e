package graft

import graft.Ckpt._
import org.apache.spark.sql.functions._

/** Dev-only probe: what join strategy does the pagerank round update
  * actually plan, and what does forcing a broadcast do to it?
  * Usage: tools/run.sh graft.GraphJoinProbe [sfDir]
  */
object GraphJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-gjoin-probe")
    val t = Tables(spark, sfDir)
    val flows = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct().persist()
    val edges = flows.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(flows.select(col("c").as("src"), col("s").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val linked = edges.join(deg, "src").repartition(col("src")).persist()
    val nodes = linked.select(col("src").as("node")).distinct().persist()
    println(s"[gjoin] linked rows = ${linked.count()}, nodes = ${nodes.count()}")
    val scores = nodes.select(col("node"), lit(1000000L).as("score")).materialize()
    val upd = linked
      .join(scores.select(col("node").as("src"), col("score")), "src")
      .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
    println("[gjoin] ---- current update plan ----")
    upd.explain("formatted")
    val updB = linked
      .join(broadcast(scores.select(col("node").as("src"), col("score"))), "src")
      .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
    println("[gjoin] ---- broadcast update plan ----")
    updB.explain("formatted")
    def timed(tag: String)(body: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[gjoin] $tag: min=${ts.min}%.3f runs=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    timed("current update")(upd.write.format("noop").mode("overwrite").save())
    timed("broadcast update")(updB.write.format("noop").mode("overwrite").save())
    // and the second (left_outer) join of a round
    val inbound = updB.withColumnRenamed("dst", "node")
    val next = scores.select(col("node"), col("score").as("prev"))
      .join(inbound, Seq("node"), "left_outer")
    val nextB = scores.select(col("node"), col("score").as("prev"))
      .join(broadcast(inbound), Seq("node"), "left_outer")
    timed("left_outer current")(next.write.format("noop").mode("overwrite").save())
    timed("left_outer broadcast")(nextB.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
