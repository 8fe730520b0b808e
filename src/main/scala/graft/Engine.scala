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
    * `spark.sql.legacy.parquet.nanosAsLong=true` stays set defensively:
    * earlier fixture generations stored `events.ts` as Parquet
    * TIMESTAMP(NANOS), which Spark 4.x refuses to read without it
    * (SURVEY.md §1.2). Current fixtures store TIMESTAMP(MICROS) — the
    * flag is a no-op there, and [[Tables.events]] adapts to either shape.
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
      // Always use the serialized (tungsten-sort) shuffle writer, never
      // the bypass-merge writer: bypass opens ONE FILE PER REDUCE
      // PARTITION per map task (32×32 = 1024 creates per exchange here),
      // and thread-dump sampling showed >half of shuffle-stage task time
      // inside FileOutputStream.open0 — the pagerank round loop's
      // groupBy measured 0.35 → 0.17 s/pass with the sort writer's
      // one-file-per-map-task layout. This is also the CLUSTER-FAITHFUL
      // writer: at production shuffle.partitions (≫ the 200-partition
      // bypass threshold) the sort writer is what runs anyway, so the
      // default-200 bypass only ever engaged in small local runs.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"))
      // Local default only (a cluster sets its fast local disks via
      // spark-submit / spark-defaults): shuffle + spill files on the
      // sandbox's root disk pay a real file-create/write cost per block;
      // tmpfs removes it (a further ~15% on the shuffle-bound loop
      // above). Guarded so environments without a writable /dev/shm fall
      // back to the JVM tmpdir unchanged.
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark-local"
        else sys.props("java.io.tmpdir")))
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

  /** Parallelism FLOOR for CPU-bound per-row stages (codec decode,
    * signature/hash kernels, exact-decimal math, regex chains): when
    * the input plans to fewer partitions than the session's default
    * parallelism, round-robin repartition it up; otherwise return it
    * UNTOUCHED. The fixture tables are single parquet row groups, so
    * without the floor every scan-rooted stage runs as ONE task and a
    * 32-core box decodes/hashes serially (measured: the l5 codec
    * family, minhash signatures and the PQ encode all single-task).
    * On a real corpus a scan already exceeds the floor and this adds
    * NOTHING — no shuffle, no plan change — so the posture is
    * scale-adaptive rather than a local[32] constant; the target is
    * `sparkContext.defaultParallelism`, which tracks the deployment's
    * core count (and the driver's low-core bench runs) by definition.
    * Round-robin repartition keeps Spark's sort-before-repartition
    * determinism (retried tasks reproduce the same assignment), and a
    * pure repartition changes no rows, so declared-query output — and
    * the DuckDB oracle hash — is unchanged by construction. Apply it
    * to NARROW inputs (ids, payload columns about to fan out) per the
    * shuffle-fewer-bytes rule; scan+light-agg queries keep their
    * single fused stage.
    */
  def parallelFloor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // the planned-partition probe (df.rdd) costs real per-invocation
    // driver time (plan → physical → RDD DAG), so the decision is
    // memoized per (session, canonical plan) — deterministic inputs
    // (parquet-rooted frames over an immutable fixture dir) make the
    // count a pure function of the plan
    val n = FloorPartsCache.getOrElseUpdate(df.sparkSession,
      df.queryExecution.analyzed.canonicalized)(df.rdd.getNumPartitions)
    if (n < target) df.repartition(target) else df
  }

  /** [[parallelFloor]] with HASH partitioning on a deterministic key —
    * for inputs that feed a persist(): a round-robin exchange in a
    * cached lineage broke cross-invocation cache matching (measured:
    * warm spanStarts re-computed 32-way), while hash partitioning
    * canonicalizes stably.
    */
  def parallelFloorBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n = FloorPartsCache.getOrElseUpdate(df.sparkSession,
      df.queryExecution.analyzed.canonicalized)(df.rdd.getNumPartitions)
    if (n < target) df.repartition(target, key) else df
  }

  private val FloorPartsCache = new SessionCache[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int]

  /** Keyed parallelism floor for ROW-MULTIPLYING stages (explode/generate
    * above a keyed window or aggregate): AQE's partition coalescing sizes
    * the exchange by its OWN bytes and is blind to a downstream
    * generator's fan-out, so a small keyed frame collapses to one
    * partition and the explosion (and everything fused above it) runs
    * serially. When the frame's OPTIMIZER-ESTIMATED size is below
    * defaultParallelism × the AQE advisory partition size — i.e. exactly
    * the regime where AQE would coalesce below core count — pin an
    * explicit keyed repartition to defaultParallelism (explicit
    * numPartitions is exempt from AQE coalescing, and the window/agg
    * above reuses the exchange, so no shuffle is added). Above that
    * size the frame is returned UNTOUCHED and AQE's size-based choice
    * stands — at the 100 TB design point this branch never fires.
    */
  def fanoutFloorBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      sess.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(advisory) * target) df.repartition(target, key) else df
  }
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

  /** `events` with `ts` as a proper microsecond TimestampType, whatever the
    * fixture generation stored. Older driver fixtures wrote `ts` as Parquet
    * TIMESTAMP(NANOS) — with the legacy nanosAsLong flag Spark reads that as
    * LONG nanoseconds, and integer division (`DIV`) is mandatory (a double
    * roundtrip at ~1.7e18 ns loses ~189 ns and can flip the microsecond).
    * Newer fixtures store TIMESTAMP(MICROS), which reads as TimestampType
    * directly. Both shapes normalize to the same µs timestamp here.
    */
  def events: DataFrame = {
    val raw = load("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
  }

  /** Raw events with `ts` as LONG nanoseconds — the exact-integer form the
    * as-of/PIT operators and the MQ payload encoder key on. Adaptive like
    * [[events]]: a native-timestamp fixture converts via `unix_micros * 1000`
    * (exact — µs-precision input has no sub-µs bits to lose).
    */
  def eventsRaw: DataFrame = {
    val raw = load("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
  }

  /** The SQL STRING entry point: register every fixture table as a temp
    * view so `spark.sql("SELECT … FROM lineitem …")` works against this
    * corpus with zero further setup — Catalyst gives the whole SQL
    * surface (joins, windows, CTEs, the engine's registered native
    * functions via GraftExtensions) for free once the views exist.
    * `events` registers in its NORMALIZED µs-timestamp form, so SQL
    * users see the same chrono semantics as every DataFrame operator.
    * Temp views are lazy metadata (name → plan), re-registration is
    * idempotent, and each view's scan still gets full pushdown/pruning.
    */
  def registerViews(): Unit = {
    Seq("region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "documents" -> documents,
      "embeddings" -> embeddings, "events" -> events)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }
}
