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
}
