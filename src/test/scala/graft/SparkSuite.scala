package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + fixture paths for all suites (one JVM,
  * sequential suites — sbt `Test / fork := true`).
  */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("graft-test", cores = 8)
  val sf0001 = "/root/testdata/sf0.001"
}

trait SparkSuite extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf0001
  def tables: Tables = Tables(spark, sf)

  /** Order-insensitive row-set equality with exact cell compare. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(a.columns.sorted.sameElements(b.columns.sorted),
      s"columns differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val order = a.columns.sorted.map(c => a.columns.indexOf(c))
    val orderB = a.columns.sorted.map(c => b.columns.indexOf(c))
    val ka = ra.map(r => order.map(i => String.valueOf(r.get(i))).toSeq).sortBy(_.mkString("|"))
    val kb = rb.map(r => orderB.map(i => String.valueOf(r.get(i))).toSeq).sortBy(_.mkString("|"))
    assert(ka == kb, s"row sets differ (${ra.size} vs ${rb.size} rows)")
  }
}
