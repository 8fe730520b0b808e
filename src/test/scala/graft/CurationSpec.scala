package graft

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L8 training-data assembly semantics the DuckDB oracles can't see:
  * distributed-prefix-sum == naive window, hash-split stability under
  * repartitioning, rate-threshold edge cases.
  */
class CurationSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("L8 rate thresholds: numeric order, all-keep sentinel, endpoints") {
    assert(Curation.rateThreshold(1000) == "g")
    assert(Curation.rateThreshold(0) == "0000")
    assert(Curation.rateThreshold(500) == "8000")
    // monotone: higher rate → lexicographically later threshold
    val ts = (0 to 999 by 37).map(Curation.rateThreshold)
    assert(ts == ts.sorted && ts.distinct == ts)
    assert(ts.forall(t => t.length == 4 && t < "g"))
  }

  test("L8 split: partitions the corpus, ~80/10/10, stable under repartition") {
    val docs = tables.documents.select(col("doc_id"))
    val n = docs.count()
    val bySplit = docs.select(Curation.splitExpr(col("doc_id")).as("s"))
      .groupBy(col("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == n) // total partition, no doc lost or doubled
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    // membership is a pure function of doc_id: any re-layout agrees
    val a = docs.select(col("doc_id"), Curation.splitExpr(col("doc_id")).as("s"))
    val b = docs.repartition(13)
      .select(col("doc_id"), Curation.splitExpr(col("doc_id")).as("s"))
    assertSameRows(a, b)
  }

  test("L8 mix: rate 1000 keeps all, rate 0 keeps none, default applies") {
    val docs = tables.documents.select(col("doc_id"), col("source"))
    val all = docs.filter(Curation.mixFilter(col("source"), col("doc_id"),
      Map.empty, defaultPermille = 1000)).count()
    assert(all == docs.count())
    val none = docs.filter(Curation.mixFilter(col("source"), col("doc_id"),
      Map.empty, defaultPermille = 0)).count()
    assert(none == 0)
    // a named source's rate overrides the default
    val srcOnly = docs.filter(Curation.mixFilter(col("source"), col("doc_id"),
      Map("src0" -> 1000), defaultPermille = 0))
    assert(srcOnly.select(col("source")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("src0"))
  }

  test("L8 plan shapes: split prunes the scan to 2 columns; pack's data window is per-pid") {
    val splitQ = Curation.l8Split(spark, sf)
    val scan = splitQ.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    // only doc_id + text reach the parquet scan (not lang/source/n_chars)
    assert(scan.contains("doc_id") && scan.contains("text"), scan)
    assert(!scan.contains("source") && !scan.contains("n_chars"), scan)
    // the full-data running sum is windowed BY pid — the only
    // SinglePartition structure allowed is the numPartitions-row offset
    // branch, which sits behind the broadcast
    val pack = Curation.packBins(tables.documents,
      size(split(col("text"), " ")).cast("long"), 256L)
    val windows = pack.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("pid")), windows.mkString("\n"))
  }

  test("L8 cap: at most k per source, hash-order deterministic, subset of corpus") {
    val out = Curation.l8Cap(spark, sf).collect()
    val perSource = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val expected = tables.documents.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) ->
        math.min(r.getLong(1), Curation.CapPerSource.toLong).toInt).toMap
    assert(perSource == expected) // min(count, cap) per source, none lost
    assert(expected.values.exists(_ == Curation.CapPerSource)) // cap actually binds somewhere
    // same selection on a genuinely different physical layout: the salted
    // phase-1 window partitions by spark_partition_id, so repartitioning
    // the input changes the salt slices — WHICH docs survive must not move
    val relaid = graft.operators.Relational.topKPerGroupSkewSafe(
      tables.documents.select(col("doc_id"), col("source"),
        md5(concat(lit("cap|"), col("doc_id").cast("string"))).as("h"))
        .repartition(13),
      keys = Seq("source"), order = Seq(col("h"), col("doc_id")),
      k = Curation.CapPerSource)
    assert(out.map(_.getLong(0)).toSet ==
      relaid.select(col("doc_id")).collect().map(_.getLong(0)).toSet)
  }

  test("L8 quality gate: keeps at least half, every survivor clears the median") {
    val kept = Curation.l8QualityGate(spark, sf).collect()
    val n = tables.documents.count()
    assert(kept.length >= n / 2 && kept.length < n) // median gate, ties included
    val med = kept.head.getDouble(2)
    assert(kept.forall(r => r.getLong(1) >= med))
    // the median column is a single corpus-wide constant
    assert(kept.map(_.getDouble(2)).toSet.size == 1)
  }

  test("L8 pack: distributed prefix sum == single-partition window, bins contiguous") {
    val docs = tables.documents
    val tokens = size(split(col("text"), " ")).cast("long")
    val dist = Curation.packBins(docs, tokens, budget = 256L, partitions = 8)
    val naive = docs.select(col("doc_id"), tokens.as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("tokens_before DIV 256L").as("bin"))
    assertSameRows(dist, naive)
    // the monotone-bucket decomposition (the declared queries' path)
    // computes the same bins as both the sampler path and the naive
    // window — boundary associativity holds for ANY monotone bucket,
    // including a deliberately skewed one (width 7 over dense ids) and
    // the degenerate single-bucket one
    val bucketed = Curation.packBins(docs, tokens, budget = 256L,
      bucket = Some(expr("doc_id DIV 7")))
    assertSameRows(bucketed, naive)
    val oneBucket = Curation.packBins(docs, tokens, budget = 256L,
      bucket = Some(lit(0L)))
    assertSameRows(oneBucket, naive)
    // bins cover a contiguous doc_id range: max(bin k) < min(bin k+1)
    val perBin = dist.groupBy(col("bin"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("bin")).collect()
    perBin.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
    // every bin except possibly the last reaches the budget once its
    // straddling doc lands: n_tokens >= budget - (max single doc tokens)
    val binTotals = dist.groupBy(col("bin")).agg(sum(col("n_tokens")).as("t"))
      .orderBy(col("bin")).collect().map(_.getLong(1))
    val maxDoc = dist.agg(max(col("n_tokens"))).collect()(0).getLong(0)
    binTotals.init.foreach(t => assert(t > 256L - maxDoc))
  }

  test("L8 cluster sample: exactly k per cluster, singleton always kept, seed changes pick") {
    import TestSpark.spark.implicits._
    // clusters: {1,2,3}, {10,11}, {20}
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("doc_id", "cluster_rep")
    val s1 = Curation.clusterSample(labels, k = 1, seed = "s1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // sizes correct, exactly one sampled per cluster, singleton kept
    assert(s1.map(r => r._2 -> r._3).toMap == Map(1L -> 3L, 10L -> 2L, 20L -> 1L))
    assert(s1.filter(_._4).map(_._2).sorted.toSeq == Seq(1L, 10L, 20L))
    assert(s1.find(_._1 == 20L).get._4)
    // k = 2 keeps two of the triple, both of the pair
    val s2 = Curation.clusterSample(labels, k = 2, seed = "s1").collect()
      .map(r => (r.getLong(1), r.getBoolean(3)))
    assert(s2.count(r => r._1 == 1L && r._2) == 2 && s2.count(r => r._1 == 10L && r._2) == 2)
    // determinism: same seed → same picks; the hash rank is seed-driven
    val s1b = Curation.clusterSample(labels, k = 1, seed = "s1").collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toSet
    assert(s1.map(r => (r._1, r._4)).toSet == s1b)
  }

  test("L9 decontam: exact n-gram hit flags, (n-1)-gram overlap does not") {
    // benchmark doc: 5 tokens = exactly one 5-gram "q w e r t"
    val benchmark = Seq((100L, "q w e r t")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y q w e r t z"),  // contains the full 5-gram → contaminated
      (2L, "q w e r u t"),      // shares only a 4-gram prefix → clean
      (3L, "t r e w q"),        // same vocabulary, reversed order → clean
      (4L, "q w e r"),          // shorter than n → no grams at all → clean
      (5L, "q w e r t")         // verbatim copy → contaminated
    ).toDF("doc_id", "text")
    val hit = Curation.contaminatedIds(corpus, benchmark, n = 5)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    // the benchmark gram set must reach the join as a BROADCAST: the
    // corpus-side gram explosion never shuffles at any corpus scale
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("L9 decontam: a doc is never contaminated by its own split") {
    // every contaminated id must be a train doc, and dropping the
    // contaminated set leaves a train corpus with ZERO eval-gram overlap
    val out = Curation.l9Decontam(spark, sf).collect()
    val nTrain = out.map(_.getLong(1)).sum
    val nContam = out.map(_.getLong(2)).sum
    assert(nTrain > 0 && nContam >= 0 && nContam < nTrain)
    val docs = tables.documents.select(col("doc_id"), col("text"),
      Curation.splitExpr(col("doc_id")).as("split"))
    val train = docs.filter(col("split") === "train")
    val testSplit = docs.filter(col("split") === "test")
    val contaminated = Curation.contaminatedIds(train, testSplit)
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    assert(Curation.contaminatedIds(clean, testSplit).count() == 0)
    assert(contaminated.count() == nContam)
  }

  test("L8 shuffle: distributed epoch order == naive global window, salts independent") {
    val docs = tables.documents
    val dist = Curation.epochOrder(docs, col("doc_id"), "epoch0", partitions = 8)
    val naive = docs.select(col("doc_id"),
        md5(concat(lit("epoch0|"), col("doc_id").cast("string"))).as("h"))
      .withColumn("pos", row_number().over(Window.orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), col("pos"))
    assertSameRows(dist, naive)
    // a permutation: positions are exactly 1..n, each id once
    val n = docs.count()
    val poss = dist.select(col("pos")).collect().map(_.getInt(0)).sorted
    assert(poss.toSeq == (1 to n.toInt))
    // a different epoch salt yields a genuinely different permutation
    val e1 = Curation.epochOrder(docs, col("doc_id"), "epoch1", partitions = 8)
    val moved = dist.as("a").join(e1.as("b"), "doc_id")
      .filter(col("a.pos") =!= col("b.pos")).count()
    assert(moved > n / 2, s"only $moved of $n docs moved between epochs")
  }

  test("L8i stratified sample: distributed rank == naive window, exact ⌈rate·n⌉ per stratum") {
    val docs = tables.documents.select(col("doc_id"), col("lang"), col("source"))
    val rate = 150
    val dist = Curation.stratifiedSample(docs, Seq("lang", "source"), "doc_id",
      rate, "tsalt", partitions = 8)
    // boundary associativity: the prefix-sum rank equals a plain window rank
    val naive = docs
      .withColumn("__h", md5(concat(lit("tsalt|"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("source")).orderBy(col("__h"), col("doc_id"))))
      .withColumn("stratum_size",
        count(lit(1)).over(Window.partitionBy(col("lang"), col("source"))))
      .select(col("doc_id"), col("lang"), col("source"), col("stratum_size"),
        col("rn"), (col("rn") <= expr(s"(stratum_size * $rate + 999) DIV 1000")).as("sampled"))
    assertSameRows(dist, naive)
    // per-stratum kept count is EXACTLY ⌈rate · n⌉ — and never zero: the
    // whole point over a hash-threshold sample, whose counts drift
    val perStratum = dist.groupBy(col("lang"), col("source"))
      .agg(max(col("stratum_size")).as("n"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("kept"))
      .collect()
    assert(perStratum.nonEmpty)
    perStratum.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n"), r.getAs[Long]("kept"))
      assert(kept == (n * rate + 999) / 1000,
        s"stratum ${r.get(0)}/${r.get(1)}: kept $kept of $n at $rate‰")
      assert(kept >= 1)
    }
    // input partitioning must not matter: the internal range repartition
    // + localCheckpoint pins one materialized order regardless of how the
    // caller's frame arrives
    val reparted = Curation.stratifiedSample(docs.repartition(13),
      Seq("lang", "source"), "doc_id", rate, "tsalt", partitions = 8)
    assertSameRows(dist, reparted)
    // rate endpoints: 1000‰ keeps everything, 0‰ keeps ⌈0⌉ = 0
    val all = Curation.stratifiedSample(docs, Seq("lang"), "doc_id", 1000, "tsalt", 8)
    assert(all.filter(!col("sampled")).count() == 0)
    val none = Curation.stratifiedSample(docs, Seq("lang"), "doc_id", 0, "tsalt", 8)
    assert(none.filter(col("sampled")).count() == 0)
  }

  test("L8 declared samplers: memoized stratum counts == fresh recompute") {
    // the declared queries route the decomposition's bucket-count collect
    // through a session cache (documentsStratumCounts); the cached path
    // must be row-identical to the generic un-memoized call at the same
    // (strata, keyCol, salt, partitions) — the recompute-equality pin
    // every session cache in the engine carries
    val docs = tables.documents
    assertSameRows(
      Curation.l8StratifiedSample(spark, sf),
      Curation.stratifiedSample(docs, Seq("lang", "source"), "doc_id",
        Curation.StratifiedRatePermille, Curation.StratifiedSalt)
        .orderBy(col("doc_id")))
    assertSameRows(
      Curation.l8TemperatureMix(spark, sf),
      Curation.temperatureMix(docs, "lang", "doc_id",
        Curation.TemperatureKeepPermille, Curation.TemperatureSalt)
        .orderBy(col("doc_id")))
  }

  test("L8j temperature mix: √-flattened quotas, budget respected, rank == naive window") {
    val docs = tables.documents.select(col("doc_id"), col("lang"))
    val keep = 400
    val out = Curation.temperatureMix(docs, "lang", "doc_id", keep, "tsalt", partitions = 8)
    val strata = out.groupBy(col("lang"))
      .agg(max(col("stratum_size")).as("n"), max(col("quota")).as("q"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("q"), r.getAs[Long]("kept")))
    assert(strata.length > 1)
    strata.foreach { case (n, q, kept) =>
      assert(q >= 1 && q <= n, s"quota $q outside [1, $n]")
      assert(kept == q, s"kept $kept != quota $q")
    }
    // flattening: the IDEAL keep rate K·√n/(T·n) is strictly decreasing in
    // n; quotas sit within +1 of ideal (⌈·⌉), so adjacent strata get the
    // ceiling-tolerant inequality and the extreme strata the strict one
    val bySize = strata.sortBy(_._1)
    bySize.zip(bySize.tail).foreach { case ((n1, q1, _), (n2, q2, _)) =>
      assert((q1 + 1) * n2 >= (q2 - 1) * n1,
        s"keep rate increased with size: $q1/$n1 -> $q2/$n2")
      assert(q1 <= q2, s"quota not monotone in stratum size: $q1 > $q2")
    }
    val (nMin, qMin, _) = bySize.head
    val (nMax, qMax, _) = bySize.last
    assert(qMax * nMin < qMin * nMax,
      s"largest stratum not flattened: $qMax/$nMax vs $qMin/$nMin")
    // total stays within the budget K plus the per-stratum ceiling slack
    val N = strata.map(_._1).sum
    val K = N * keep / 1000
    val total = strata.map(_._2).sum
    assert(total <= K + strata.length, s"quotas $total blow the budget $K")
    // the distributed rank is the same as a naive per-stratum window rank
    val naive = docs
      .withColumn("__h", md5(concat(lit("tsalt|"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("rn"))
    assertSameRows(out.select(col("doc_id"), col("rn")), naive)
  }

  test("L8m importance sample: permille interpolates with quality, bounds hit, membership deterministic") {
    val out = Curation.importanceSample(tables.documents).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("nll_micro"), r.getAs[Long]("p_permille"), r.getAs[Boolean]("kept"))).toMap
    assert(byId.size == tables.documents.count())
    val ps = byId.values.map(_._2)
    // bounds: the best doc sits at the ceiling, the worst at the floor
    assert(ps.max == Curation.ImpCeilPermille && ps.min == Curation.ImpFloorPermille)
    // monotone: lower NLL (better) never gets a lower keep-permille
    val sorted = byId.values.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2, s"p not antitone in NLL: $a vs $b") case _ => }
    // p=1000 docs are always kept (the hex threshold has no sentinel row)
    byId.values.filter(_._2 >= 1000).foreach { v => assert(v._3) }
    // determinism: a rerun keeps exactly the same membership
    val again = Curation.importanceSample(tables.documents).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(byId.forall { case (id, (_, _, k)) => again(id) == k })
    // the sample is biased: kept docs have a better (lower) mean NLL
    val keptNll = byId.values.filter(_._3).map(_._1)
    val dropNll = byId.values.filterNot(_._3).map(_._1)
    assert(keptNll.nonEmpty && dropNll.nonEmpty)
    assert(keptNll.sum / keptNll.size < dropNll.sum / dropNll.size)
  }

  test("L9b fuzzy decontam catches reordered benchmark text that exact n-grams miss") {
    // benchmark doc + three corpus docs: a word-REORDERED copy (token-set
    // Jaccard 1.0 but no shared 5-gram), a near-copy with one word swapped
    // (Jaccard just under 1), and an unrelated doc
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"), // reordered
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 9/11 ≈ 0.82
      (3L, "one two three four five six seven eight nine ten")           // disjoint
    ).toDF("doc_id", "text")
    val fuzzy = Curation.fuzzyContaminatedIds(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(fuzzy.contains(1L), "reordered copy must be caught")
    assert(!fuzzy.contains(3L), "disjoint doc must not be caught")
    // doc 2: Jaccard 9/11 ≈ 0.818 ≥ 0.8 — caught IF some band collides;
    // with 8 bands × 2 rows the expected band-agreement is high but not
    // certain, so only assert it never FALSELY verifies below τ
    val exact = Curation.contaminatedIds(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(!exact.contains(1L), "exact 5-gram decontam is blind to reordering")
    // threshold respected: τ=0.9 must drop doc 2 (0.818) but keep doc 1 (1.0)
    val strict = Curation.fuzzyContaminatedIds(corpus, bench, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(strict.contains(1L) && !strict.contains(2L))
  }

  test("L9c bloom decontam: superset of exact, join-free probe, reference lanes") {
    // hand corpus: exact hits must be flagged (no false NEGATIVES, ever)
    val benchmark = Seq((100L, "q w e r t")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y q w e r t z"),  // contains the benchmark 5-gram
      (4L, "q w e r"),          // shorter than n → no grams → clean
      (5L, "q w e r t")         // verbatim copy
    ).toDF("doc_id", "text")
    val hit = Curation.bloomContaminatedIds(corpus, benchmark, n = 5)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    // the probe side must be JOIN-FREE — scan → narrow filter is the
    // whole point of the bloom variant (the filter rides in as a
    // literal; the only exchange is the id distinct)
    val plan = hit.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // reference lane arithmetic: positions from java MessageDigest md5
    // must match what the filter sets — plant ONLY gram g1 in the
    // benchmark, then a probe gram g2 ≠ g1 is flagged iff all four of
    // its reference positions landed in g1's reference position set
    def positions(gram: String): Seq[Long] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      (0 until Curation.BloomHashes).map(i => (h1 + i * h2) % Curation.BloomMinBits)
    }
    val g1 = "q w e r t"
    assert(positions(g1).forall(p => p >= 0 && p < Curation.BloomMinBits))
    val g2 = "a b c d e" // independent gram: expect NOT flagged (4 independent
    assert(!positions(g2).forall(positions(g1).toSet), // 17-bit collisions)
      s"reference says g2 should miss: ${positions(g2)} vs ${positions(g1)}")
    val miss = Curation.bloomContaminatedIds(
      Seq((7L, g2)).toDF("doc_id", "text"), benchmark, n = 5)
    assert(miss.count() == 0)
    // fixture: bloom output is a SUPERSET of the exact variant's (false
    // positives only ever flag extra, never miss)
    val docs = tables.documents.select(col("doc_id"), col("text"),
      Curation.splitExpr(col("doc_id")).as("split"))
    val train = docs.filter(col("split") === "train")
    val testSplit = docs.filter(col("split") === "test")
    val exactIds = Curation.contaminatedIds(train, testSplit)
      .collect().map(_.getLong(0)).toSet
    val bloomIds = Curation.bloomContaminatedIds(train, testSplit)
      .collect().map(_.getLong(0)).toSet
    assert(exactIds.subsetOf(bloomIds),
      s"bloom lost exact hits: ${exactIds.diff(bloomIds)}")
    // declared-query summary is consistent with the id set
    val out = Curation.l9BloomDecontam(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == bloomIds.size)
    assert(out.map(_.getLong(3)).sum == bloomIds.sum)
  }

  test("L0 pipeline: composed manifest == stagewise recomputation with naive pack") {
    import graft.operators.{Dedup, TextOps}
    val out = Curation.l0Pipeline(spark, sf)
    val docs = tables.documents
    val g = TextOps.gopherRules(docs).filter(col("keep")).select("doc_id")
    val d = Dedup.dupSpanCoverage(docs).filter(col("keep")).select("doc_id")
    val surv = docs.join(g, "doc_id").join(d, "doc_id")
    val bk = TextOps.ccnetBuckets(surv).filter(col("bucket") =!= lit("tail"))
    val naive = bk
      .withColumn("tokens_before", coalesce(
        sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"tokens_before DIV ${Curation.PackBudget}L").as("bin"))
    assertSameRows(out, naive)
    // the tail really is dropped, and the kept share is the integer-tenths
    // 60 % cut of the survivor ranking
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(r => Set("head", "middle")(r.getAs[String]("bucket"))))
    val nSurv = surv.count()
    val expectKept = (1 to nSurv.toInt).count(r => (r - 1) * 10 / nSurv < 6)
    assert(rows.length == expectKept, s"${rows.length} kept of $nSurv survivors")
    // bins are contiguous from 0
    val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
    assert(bins.head == 0L && bins.sameElements(0L to bins.last))
  }

  test("L8k shards: content hash == driver-side reconstruction, token mass conserved") {
    val docs = tables.documents
    val budget = 300L
    val shards = Curation.buildShards(docs, size(split(col("text"), " ")).cast("long"), budget)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    // token mass is conserved: every doc lands in exactly one shard
    val totalTokens = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .first().getLong(0)
    assert(shards.values.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    assert(shards.values.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // byte-exact content: rebuild each shard on the driver from the same
    // packing and compare md5s
    val packed = Curation.packBins(docs, size(split(col("text"), " ")).cast("long"), budget)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("bin"), col("doc_id"), col("text")).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    packed.groupBy(_.getAs[Long]("bin")).foreach { case (bin, rows) =>
      val text = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[String]("text")).mkString(" ")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(shards(bin).getAs[String]("shard_md5") == hex, s"bin $bin content differs")
    }
    // bins respect the budget up to one doc tail: every bin except the
    // last holds at least the budget's worth of starts
    val binSizes = shards.toSeq.sortBy(_._1).map(_._2.getAs[Long]("n_tokens"))
    binSizes.dropRight(1).zipWithIndex.foreach { case (n, i) =>
      assert(n > 0, s"empty bin $i")
    }
  }

  test("L8g chunking: full windows, declared overlap, tail reaches the end") {
    val (c, s) = (Curation.ChunkSize, Curation.ChunkStride)
    val docs = tables.documents.limit(50)
    val byDoc = Curation.chunkTokens(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.sortBy(_.getAs[Int]("chunk_id")) }
    val nTok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    assert(byDoc.nonEmpty && byDoc.keySet == nTok.keySet)
    byDoc.foreach { case (id, chunks) =>
      // every chunk but the last is a full window; the last ends the doc
      chunks.init.foreach(r => assert(r.getAs[Int]("n_tokens") == c))
      val last = chunks.last
      assert(last.getAs[Int]("chunk_id") * s + last.getAs[Int]("n_tokens")
        == nTok(id))
      // adjacent windows share exactly size-stride tokens
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          val ta = a.getAs[String]("chunk_text").split(" ")
          val tb = b.getAs[String]("chunk_text").split(" ")
          assert(ta.drop(s).sameElements(tb.take(c - s)))
        case _ =>
      }
    }
  }

  test("l0 vanilla twin computes the engine's answer (twin-honesty pin)") {
    // the TWINS.json ratio for l0_pipeline is only meaningful if the
    // naive composition answers the same question — both sides share the
    // published thresholds and integer snaps, so the pin is exact
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).toList
    assert(rows(graft.TailTwins.twinFrame(spark, sf, "l0_pipeline")) ==
      rows(Curation.l0Pipeline(spark, sf)))
  }

  test("L8g chunking with stride == size reconstructs the document exactly") {
    val docs = tables.documents.limit(20)
    val rebuilt = Curation.chunkTokens(docs, chunkSize = 64, stride = 64)
      .groupBy("doc_id")
      .agg(array_join(sort_array(collect_list(
        struct(col("chunk_id"), col("chunk_text")))).getField("chunk_text"), " ")
        .as("rebuilt"))
    val joined = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text"))
    assert(joined.count() == 0)
  }

  test("L8i stratified sample: NULL-stratum rows survive with correct ranks") {
    // a USING/equi join on strata drops null-stratum rows silently — a
    // document with missing metadata vanishing from the sample; the
    // null-safe (<=>) offsets join keeps them as their own stratum
    val docs = tables.documents.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("lang"))
    val out = Curation.stratifiedSample(docs, Seq("lang"), "doc_id", 500, "nsalt", 8)
    assert(out.count() == docs.count(), "null-stratum rows were dropped")
    assert(out.filter(col("lang").isNull).count() ==
      docs.filter(col("lang").isNull).count())
    val naive = docs
      .withColumn("__h", md5(concat(lit("nsalt|"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rn"))
    assertSameRows(out.select(col("doc_id"), col("rn")), naive)
    // temperatureMix composes the same rank with a quota join — the null
    // stratum must survive there too, with a genuine quota
    val mix = Curation.temperatureMix(docs, "lang", "doc_id", 400, "nsalt", 8)
    assert(mix.count() == docs.count(), "temperatureMix dropped null-stratum rows")
    val nullRows = mix.filter(col("lang").isNull)
    assert(nullRows.count() == docs.filter(col("lang").isNull).count())
    assert(nullRows.filter(col("sampled")).count() ==
      nullRows.select(max(when(col("rn") <= col("quota"), col("rn")))).head().getLong(0))
  }
}
