package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S6: CSV/JSON batch IO round-trips — write a fixture slice, read it
  * back with an explicit schema, values survive bit-exactly.
  */
class IOSpec extends SparkSuite {

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-io-$fmt").toString + "/out"
    val src = tables.customer
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    src.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").schema(src.schema).load(dir)
    assertSameRows(src, back)
  }

  test("S6 CSV round-trip preserves rows and values") { roundTrip("csv") }
  test("S6 JSON round-trip preserves rows and values") { roundTrip("json") }

  test("S6b compaction writer: sizes file count from stats, preserves data, prunes by range") {
    import graft.sources.BatchIO
    val src = tables.lineitem // pre-shuffled into many tiny partitions
      .repartition(64, col("l_partkey"))
    val dir = Files.createTempDirectory("graft-io-compact").toString + "/out"
    // force a small target so the estimate yields a handful of files
    val n = BatchIO.writeCompacted(src, dir, targetBytes = 256L << 10,
      sortKeys = Seq(col("l_orderkey")))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == n, s"wrote ${files.length} files, sized $n")
    assert(n < 64, "compaction must write fewer files than input partitions")
    val back = spark.read.parquet(dir)
    assertSameRows(src, back)
    // range layout: each file covers a disjoint l_orderkey range
    val ranges = files.sorted(Ordering.by((f: java.io.File) => f.getName)).map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect()(0)
      (d.getLong(0), d.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"overlapping file ranges $a $b")
      case _ =>
    }
  }
}
