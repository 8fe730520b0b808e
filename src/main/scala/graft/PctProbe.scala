package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only probe: which IEEE formula does Spark's exact `percentile`
  * use for interpolation? Compares rank-based reconstructions against
  * expr("percentile(...)") bit-for-bit on the fixture.
  * Usage: tools/run.sh graft.PctProbe [sfDir]
  */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-pct-probe")
    val t = Tables(spark, sfDir)
    val base = t.lineitem.select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    for (p <- Seq(0.5, 0.95)) {
      val ref = base.groupBy(col("g"))
        .agg(expr(s"percentile(v, ${p})").as("ref"))
      val cnts = base.groupBy(col("g")).agg(count(col("v")).as("n"))
        .withColumn("pos", lit(p) * (col("n") - 1).cast("double"))
        .withColumn("klo", floor(col("pos")).cast("long") + 1)
        .withColumn("khi", ceil(col("pos")).cast("long") + 1)
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      val ranked = base.withColumn("rn", row_number().over(w))
      val picked = ranked.join(broadcast(cnts), "g")
        .filter(col("rn") === col("klo") || col("rn") === col("khi"))
        .groupBy(col("g"))
        .agg(min(when(col("rn") === col("klo"), col("v"))).as("lo"),
          max(when(col("rn") === col("khi"), col("v"))).as("hi"),
          first(col("pos")).as("pos"), first(col("klo")).as("klo"))
      val both = picked.join(ref, "g")
        .withColumn("frac", col("pos") - (col("klo") - 1).cast("double"))
        .withColumn("f1", when(col("klo") === col("pos") + 1, col("lo"))
          .otherwise(col("lo") + (col("hi") - col("lo")) * col("frac")))
        .withColumn("f2", when(col("klo") === col("pos") + 1, col("lo"))
          .otherwise((lit(1.0) - col("frac")) * col("lo") + col("frac") * col("hi")))
        .select(col("g"), col("ref"), col("f1"), col("f2"), col("lo"), col("hi"), col("pos"))
      both.collect().foreach { r =>
        val ref0 = r.getDouble(1); val f1 = r.getDouble(2); val f2 = r.getDouble(3)
        println(s"[pct p=$p] g=${r.getString(0)} ref=$ref0 " +
          s"f1=${f1} bitEq=${java.lang.Double.doubleToLongBits(ref0) == java.lang.Double.doubleToLongBits(f1)} " +
          s"f2=${f2} bitEq=${java.lang.Double.doubleToLongBits(ref0) == java.lang.Double.doubleToLongBits(f2)} " +
          s"lo=${r.getDouble(4)} hi=${r.getDouble(5)} pos=${r.getDouble(6)}")
      }
    }
    spark.stop()
  }
}
