package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory + fixture-table IO layer.
  *
  * Design notes (scale posture): every config here is chosen so the same
  * query code runs unchanged on a real cluster — AQE on (runtime partition
  * coalescing + skew-join splitting), broadcast threshold left at default so
  * the planner auto-broadcasts the small dimension tables, shuffle
  * partitions sized to the local core count (on a cluster this would be
  * `2-3x total executor cores`, set via spark-submit, not code).
  *
  * The reference snapshot (`/root/reference/.gitignore:1-2`) is an empty
  * JVM-project skeleton; the capability contract is defined in
  * /root/repo/SURVEY.md §2 and implemented Spark-first here.
  */
object Engine {
  /** Build the one session configuration the whole engine uses.
    * `spark.sql.legacy.parquet.nanosAsLong=true` is load-bearing:
    * `events.ts` is Parquet TIMESTAMP(NANOS) which Spark 4.x otherwise
    * refuses to read (SURVEY.md §1.2).
    */
  def session(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    // local[N, 2]: N worker threads with ONE task retry allowed — the
    // cluster-faithful posture (real deployments run task maxFailures=4);
    // local mode's default of 1 would turn any transient task failure into
    // a query failure and make at-least-once sink semantics untestable.
    val spark = SparkSession.builder()
      .master(s"local[$cores, 2]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Read parquet TIMESTAMP(MILLIS/MICROS) as TIMESTAMP_LTZ (session is
      // pinned UTC) so chrono functions (unix_micros, window, date_trunc)
      // apply directly and semantics match the DuckDB oracle.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // local default only — a cluster deployment overrides via spark-submit
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
}

/** Typed accessors for the driver-generated fixture tables.
  *
  * All loads are plain parquet scans — filters/projections added by callers
  * are pushed into the scan by Catalyst (verified via
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame   = load("region")
  def nation: DataFrame   = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame     = load("part")
  def orders: DataFrame   = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** `events` with `ts` restored to a proper microsecond TimestampType.
    * The file stores TIMESTAMP(NANOS); with the legacy flag Spark reads it
    * as LONG nanoseconds. Integer division (`DIV`) is mandatory — a double
    * roundtrip at ~1.7e18 ns loses ~189 ns of precision and can flip the
    * resulting microsecond.
    */
  def events: DataFrame =
    load("events").withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

  /** Raw events with `ts` still LONG nanos (for callers that want exact ns). */
  def eventsRaw: DataFrame = load("events")
}
