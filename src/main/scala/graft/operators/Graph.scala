package graft.operators

import graft.Ckpt._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1 (SURVEY.md §2.11): PageRank — iterative weighted graph propagation,
  * the influence/centrality score behind "which suppliers anchor the
  * network" (and, on a doc-link graph, which documents are hubs worth
  * keeping in a training corpus). Generalizes the L7 connected-components
  * machinery from min-label to weighted-mass propagation.
  *
  * Determinism (the oracle replays every round): scores are integer
  * micro-units end to end — contribution = score DIV outdeg, update =
  * (teleport·10⁶ + damping·Σcontrib) DIV 1000 with damping in permille.
  * Integer floor division is identical on any engine; no double ever
  * enters the plan, so round-for-round replay is bit-exact. The floored
  * mass leak (≤ outdeg − 1 µ per node per round) is deterministic and
  * harmless for ranking.
  *
  * Scale shape (same discipline as [[Dedup.clusterCollapse]]): the edge
  * list with out-degree attached is materialized ONCE (`localCheckpoint`;
  * reliable `checkpoint` on a cluster) and re-read every round; each
  * round is one keyed join (edges ⋈ scores on src), one partial-aggregated
  * sum per dst, and a label-frame-sized left join for teleport-only nodes
  * — all rows narrow (three int64s). Rounds are fixed (declared query) so
  * the DuckDB oracle can replay them as CTEs; a convergence-driven run
  * would reuse the [[Dedup.connectedComponents]] sum-fixed-point pattern.
  * On a real cluster the edge frame would be pre-partitioned by src and
  * cached so every round's join reuses one shuffle.
  */
object Graph {

  val DefaultIters = 5
  val DefaultDampingPermille = 850L
  val ScoreUnit = 1000000L // 1.0 in integer micro-units

  /** Fixed-round PageRank over a directed edge list (`src`, `dst`).
    * Every node must have at least one out-edge (feed an undirected graph
    * as both directions — see [[g1PageRank]]); dangling-node mass
    * redistribution is intentionally out of scope for the declared form,
    * and the precondition is ENFORCED (loud failure, not missing rows)
    * unless `validate = false`.
    * Output: (node, score) for every node, scores in micro-units.
    */
  def pageRank(edges: DataFrame, iters: Int = DefaultIters,
               dampingPermille: Long = DefaultDampingPermille,
               validate: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      "damping must be a permille in [0, 1000]")
    val teleport = (1000L - dampingPermille) * ScoreUnit
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // one materialization serves every round: (src, dst, src outdegree),
    // PRE-HASH-PARTITIONED on the per-round join key so only the (node-
    // sized) score frame shuffles each iteration — the edge shuffle is
    // paid once, not once per round
    val linked = edges.join(deg, "src")
      .repartition(col("src")).materialize()
    val nodes = linked.select(col("src").as("node")).distinct().materialize()
    // Enforce the documented precondition, don't just state it: a node
    // with in-edges but no out-edges would be silently absent from the
    // node frame (derived from src only) — its rows vanish and its
    // inbound mass is discarded. One anti-join over the already-
    // checkpointed frames, paid once per call, never per round; callers
    // on a validated pipeline can pass validate = false to skip the pass.
    if (validate) {
      val sinkOnly = linked.select(col("dst").as("node")).distinct()
        .join(nodes, Seq("node"), "left_anti")
      require(sinkOnly.isEmpty,
        "pageRank precondition violated: graph has sink-only nodes (in-edges " +
          "but no out-edges); feed both directions for an undirected graph " +
          "or add self-loops / dangling-mass handling upstream")
    }
    var scores = nodes.select(col("node"), lit(ScoreUnit).as("score"))
    for (_ <- 1 to iters) {
      val inbound = linked
        .join(scores.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(expr("score DIV d")).as("mass"))
        .withColumnRenamed("dst", "node")
      scores = nodes
        .join(inbound, Seq("node"), "left_outer")
        .select(col("node"),
          expr(s"($teleport + $dampingPermille * coalesce(mass, 0L)) DIV 1000")
            .as("score"))
        .materialize()
    }
    scores
  }

  /** G2: triangle count + global clustering coefficient, degree-oriented —
    * the standard distributed triangle algorithm: orient every undirected
    * edge from its lower-(degree, id) endpoint to the higher one, generate
    * wedges only from ORIENTED out-neighbor pairs, and close each wedge
    * against the oriented edge set. Orientation is the whole scale story:
    * out-degrees in the oriented DAG are O(√m), so wedge generation is
    * O(m^1.5) total instead of Σ deg² (a hub with a million neighbors
    * would otherwise emit 10¹² wedges); every triangle is counted exactly
    * once, from its lowest-ordered corner.
    *
    * Input: undirected edges as canonical (a, b) with a < b, no
    * duplicates. Output: one row — edge/wedge/triangle counts and the
    * global clustering coefficient 3·T/wedges as an exact integer
    * permille (DIV; no float in the plan).
    */
  def triangleStats(undRaw: DataFrame): DataFrame = {
    // the edge set feeds FOUR consumers (degrees, orientation, closure,
    // totals) — materialize once or the upstream edge build (often a
    // fact-table self-join) re-executes per consumer
    val und = undRaw.materialize()
    val deg = und.select(col("a").as("v")).unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    // orient low → high by (degree, id): struct comparison gives the
    // lexicographic (d, v) order both engines agree on
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
      .materialize() // feeds both wedge sides
    // wedges from out-neighbor pairs (x < y keeps each pair once), closed
    // against the oriented edge set (x→y or y→x both impossible to miss:
    // the closing edge is oriented by the same global order, so exactly
    // one direction exists — join on the canonical min/max pair)
    val o1 = oriented.select(col("src"), col("dst").as("x"))
    val o2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = o1.join(o2, "src").filter(col("x") < col("y"))
    // the closing x–y edge in canonical form IS a row of `und` (x < y by
    // id, und is canonical a<b) — close against the input edge set. The
    // wedge frame is the O(m^1.5) bulk of the whole job, so its shuffle
    // key is packed into ONE long when ids fit 32 bits (narrower rows,
    // single-column hash/sort on the biggest exchange); the id bound is a
    // 1-row read off the already-aggregated degree frame, and the packed
    // and two-column paths are value-identical
    val idRow = deg.agg(min(col("v")).cast("long"), max(col("v")).cast("long")).head()
    val (minId, maxId) =
      if (idRow.isNullAt(0)) (0L, 0L) else (idRow.getLong(0), idRow.getLong(1))
    val closed =
      // BOTH bounds matter: a negative id sign-extends into the high
      // word and aliases packed keys, so packing requires ids in
      // [0, 2^31) — anything else keeps the two-column join
      if (minId >= 0L && maxId < (1L << 31)) {
        wedges.select((col("x") * lit(1L << 32) + col("y")).as("xy"))
          .join(und.select((col("a") * lit(1L << 32) + col("b")).as("xy")), "xy")
      } else {
        wedges.join(und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      }
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    val totals = und.agg(count(lit(1)).as("n_edges")).crossJoin(
      deg.agg(sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))).crossJoin(tri)
    totals.select(col("n_edges"), col("n_wedges"), col("n_triangles"),
      expr("3 * n_triangles * 1000 DIV nullif(n_wedges, 0)").as("cc_permille"))
  }

  /** G2 declared query: triangle census of the part co-purchase graph —
    * parts are linked when some order contains both (the "bought
    * together" graph). Canonical a<b edges, exact integer output.
    */
  def g2Triangles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val und = t.lineitem.alias("l1")
      .join(t.lineitem.alias("l2"), col("l1.l_orderkey") === col("l2.l_orderkey"))
      .filter(col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("a"), col("l2.l_partkey").as("b"))
      .distinct()
    triangleStats(und)
  }

  /** G1 declared query: PageRank over the supplier–customer shipping graph
    * (an edge per distinct supplier→customer lineitem flow, fed in both
    * directions so the graph is undirected and dangling-free). Node ids
    * disambiguate the two keyspaces arithmetically: supplier s → 2s,
    * customer c → 2c+1. Top-20 by score.
    */
  def g1PageRank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // checkpoint the flow list BEFORE the flip-union: the two union
    // branches are separate lineages, so the lineitem⋈orders + distinct
    // build would execute once per branch (and again under pageRank's
    // degree aggregate) — materialized once, the flips read RAM blocks
    val flows = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct()
      .materialize()
    val edges = flows.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(flows.select(col("c").as("src"), col("s").as("dst")))
    pageRank(edges)
      .orderBy(col("score").desc, col("node"))
      .limit(20)
  }
}
