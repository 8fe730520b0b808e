package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

/** J10 fuzzy-join semantics beyond the oracle: the salted blocked join
  * must equal a naive blocked all-pairs reference, and the 3-arg
  * early-exit levenshtein must agree with the unbounded one on kept rows.
  */
class FuzzySpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("J10: salted blocked join == naive blocked all-pairs reference") {
    val parts = tables.part
    val got = Fuzzy.fuzzyPairs(parts, "p_partkey", "p_name",
      substring_index(col("p_name"), " ", -1), maxDist = 4)
    val a = parts.select(col("p_partkey").as("a_id"), col("p_name").as("a_name"),
      substring_index(col("p_name"), " ", -1).as("blk"))
    val b = parts.select(col("p_partkey").as("b_id"), col("p_name").as("b_name"),
      substring_index(col("p_name"), " ", -1).as("blk"))
    val naive = a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 4)
      .select("a_id", "b_id", "a_name", "b_name", "dist")
    assertSameRows(got, naive)
  }

  test("J10 match table: canonical name order, no self-pairs, bound respected, counts real") {
    val rows = Fuzzy.j10FuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("name_1") < r.getAs[String]("name_2"))
      val d = r.getAs[Int]("dist")
      assert(d >= 0 && d <= 4)
      // blocked key: pairs share the last name token
      assert(r.getAs[String]("name_1").split(" ").last ==
        r.getAs[String]("name_2").split(" ").last)
      assert(r.getAs[Long]("n_parts_1") > 0 && r.getAs[Long]("n_parts_2") > 0)
    }
    // the match table is name-level: record expansion happens by equality
    // join, so the table itself is bounded by (distinct names)²
    val names = tables.part.select("p_name").distinct().count()
    assert(rows.length <= names * (names - 1) / 2)
  }
}
