package graft.functions

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** F1–F7 (SURVEY.md §2.7): one declared query per scalar-function family,
  * each oracle-checked against DuckDB. Everything is built-in codegen'd
  * expressions — no UDFs anywhere.
  *
  * Cross-engine determinism notes (load-bearing for the hash-compare):
  *  - only IEEE-exact double ops appear un-rounded (sqrt is correctly
  *    rounded per IEEE-754; +,-,*,/ of identical doubles are exact);
  *  - transcendentals (ln/exp/pow) are AVOIDED in declared queries —
  *    libm results may differ by 1 ulp between engines;
  *  - integer widths are aligned by explicit casts (Spark length() is
  *    INT, ceil() is BIGINT, etc.).
  */
object FnQueries {

  /** F1: string functions over `documents`. */
  def f1String(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(
        col("doc_id"),
        substring(col("text"), 1, 20).as("head"),
        upper(substring(col("text"), 1, 10)).as("up_head"),
        length(col("text")).as("len"),
        split(col("text"), " ").getItem(0).as("first_tok"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        instr(col("text"), "spark").as("spark_pos"),
        regexp_extract(col("text"), "([a-z]{6,})", 1).as("first_long_word"),
        translate(substring(col("text"), 1, 20), " ", "-").as("dashed"),
        concat(col("lang"), lit("-"), col("source")).as("lang_src"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy(col("doc_id"))
  }

  /** F2: date/time functions — per order-month stats over `orders`. */
  def f2Datetime(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(
        count(lit(1)).as("n"),
        min(dayofmonth(col("o_orderdate"))).as("min_day"),
        max(dayofmonth(col("o_orderdate"))).as("max_day"),
        unix_micros(date_trunc("month", min(col("o_orderdate")))).as("month_start_us"),
        unix_micros(min(col("o_orderdate")) + expr("INTERVAL 30 DAYS")).as("plus30d_us"),
        datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("span_days"))
      .orderBy(col("y"), col("m"))
  }

  /** F3: math functions (IEEE-exact subset) over a keyed `lineitem` slice. */
  def f3Math(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc_gap"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        pmod(col("l_partkey"), lit(7)).as("pk_mod7"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        // 2-decimal prices ÷10 terminate at exactly 3 decimals — rounding
        // at 3 is boundary-free (rounding at 2 would hit exact half-cents
        // where Spark HALF_UP and DuckDB binary-rounding disagree).
        round(col("l_extendedprice") * 0.1, 3).as("tithe"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** F4: array functions (size/slice/sort/filter/higher-order) over
    * `embeddings`. Float elements are compared raw (no arithmetic) or
    * through exact-decimal sums.
    */
  def f4Array(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val emb = col("embedding")
    t.embeddings
      .select(
        col("vec_id"),
        size(emb).as("emb_dim"),
        size(filter(emb, _ > 0)).as("n_pos"),
        array_max(emb).cast("double").as("max_elem"),
        array_min(emb).cast("double").as("min_elem"),
        sort_array(slice(emb, 1, 3)).getItem(0).cast("double").as("f3_lo"),
        sort_array(slice(emb, 1, 3)).getItem(1).cast("double").as("f3_mid"),
        sort_array(slice(emb, 1, 3)).getItem(2).cast("double").as("f3_hi"),
        // Final round at 6 dp: float-origin doubles can land exactly on a
        // DECIMAL(30,15) half-boundary where Spark/DuckDB cast-rounding
        // differs by 1e-15; the 6-dp round absorbs that.
        round(aggregate(transform(slice(emb, 1, 8), x => x.cast("double").cast("decimal(30,15)")),
          lit(0).cast("decimal(30,15)"),
          (acc, x) => (acc + x).cast("decimal(30,15)"))
          .cast("double"), 6).as("head8_sum"))
      .orderBy(col("vec_id"))
  }

  /** F4c: higher-order predicate surface — exists / forall / filter-count
    * / zip_with over the embedding arrays (booleans compare directly; no
    * float arithmetic so no rounding discipline needed).
    */
  def f4Hof(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val emb = col("embedding")
    t.embeddings
      .select(
        col("vec_id"),
        exists(emb, _ > 0.9).as("has_hot"),
        forall(emb, x => abs(x) <= lit(1.0)).as("all_unit"),
        size(filter(emb, x => x > -0.5 && x < 0.5)).as("n_mid"),
        size(filter(zip_with(emb, reverse(emb), (a, b) => (a > b).cast("int")),
          _ === 1)).as("n_gt_mirror"))
      .orderBy(col("vec_id"))
  }

  /** F4b: generator/UDTF surface — posexplode of the leading dimensions. */
  def f4Explode(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.embeddings
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))
      .orderBy(col("vec_id"), col("pos"))
  }

  /** F5: map functions — build a map per event, explode it, aggregate by
    * entry. (map_keys/map_values/element_at are exercised in scalatest —
    * DuckDB's map extraction returns lists, so the oracle compares the
    * exploded-entry form.)
    */
  def f5Map(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val m = map(
      lit("type"), col("event_type"),
      lit("band"), when(col("value") > 50, lit("hi")).otherwise(lit("lo")))
    t.events
      .select(explode(m).as(Seq("k", "v")))
      .groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"), col("v"))
  }

  /** F6: JSON functions over `events.props` — both `get_json_object` and
    * `from_json` paths, cross-validated in-row then aggregated.
    */
  def f6Json(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("k_str", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_struct",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k_str")).as("sum_k"),
        min(col("k_str")).as("min_k"),
        max(col("k_str")).as("max_k"),
        sum(when(col("k_str") === col("k_struct"), 1L).otherwise(0L)).as("n_paths_agree"))
      .orderBy(col("event_type"))
  }

  /** F7: hash functions — md5/sha2 fingerprints (xxhash64/hash are
    * Spark-native, exercised in scalatest; the oracle checks the
    * portable algorithms byte-for-byte).
    */
  def f7Hash(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .filter(col("c_custkey") <= 50)
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256"),
        md5(concat(col("c_name"), lit("|"), col("c_mktsegment"))).as("composite_md5"))
      .orderBy(col("c_custkey"))
  }

  /** F8: bitwise family — and/or/xor, shifts, popcount. All exact integer
    * ops, so the oracle is a direct replay (DuckDB spells xor as a
    * function — its `^` is exponentiation — and returns bit_count as
    * TINYINT, cast to match Spark's INT).
    */
  def f8Bitwise(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderkey") <= 200)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(col("o_custkey")).as("bor"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
        shiftleft(col("o_custkey"), 4).as("shl"),
        shiftright(col("o_orderkey"), 2).as("shr"),
        expr("bit_count(o_orderkey)").as("popcnt"))
      .orderBy(col("o_orderkey"))
  }
}
