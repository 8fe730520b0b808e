package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties (SURVEY.md §5.3) over scalacheck-generated data,
  * evaluated through the real Spark expressions. Generators are sampled
  * with a fixed seed (the scalatest+scalacheck bridge artifact is not in
  * the offline cache, so sampling is driven manually — same generators,
  * deterministic replay).
  */
class PropertiesSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
  private val vec = Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0).suchThat(_.abs > 1e-3))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("codec fuzz: random and single-byte-mutated containers never throw; valid prefixes gate to None") {
    import graft.operators.{Avi, Gif, Gzip, Jpeg, Mpeg1, Multimodal}
    // the None-never-throw contract, adversarially: every decoder must
    // survive (a) arbitrary bytes, (b) VALID containers with one byte
    // flipped anywhere (the header stays plausible, so the walk goes
    // deep before the corruption bites), (c) every truncation length
    // of a small valid container. A throw — including OOM from an
    // unchecked allocation — fails the suite.
    var seed = 20260816L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) & 0x7fffffff).toInt }
    val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
      "avi" -> (b => Avi.decodeAvi(b)),
      "gif1" -> (b => Gif.decodeGif(b)),
      "gifN" -> (b => Gif.decodeGifFrames(b)),
      "jpeg" -> (b => Jpeg.decodeJpeg(b)),
      "mpeg1" -> (b => Mpeg1.decodeMpeg1Frames(b)),
      "png" -> (b => Multimodal.decodePng(b)),
      "bmp" -> (b => Multimodal.decodeBmp24(b)),
      "wav" -> (b => Multimodal.decodePcmSamples(b)),
      "avi-rle8" -> (b => Avi.decodeAviRle8(b)),
      "sniff" -> (b => Multimodal.decodeImage(b)))
    // (a) arbitrary random bytes at several sizes
    for ((name, dec) <- decoders; n <- Seq(0, 3, 13, 64, 257, 4096)) {
      val junk = Array.fill(n)(next().toByte)
      try dec(junk) catch { case e: Throwable =>
        fail(s"$name threw on $n random bytes: $e") }
    }
    // (b) one-byte mutations of VALID containers — every position
    val jf = Jpeg.buildJpegGray(Array.tabulate(64)(i => (i * 3) % 256), 8, 8)
    val valid: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("avi", Avi.buildAviMjpeg(8, 8, 30, 1, IndexedSeq(jf, jf)), b => Avi.decodeAvi(b)),
      ("gifN", Gif.buildAnimatedGif(5, 4, Array(0x102030, 0x405060, 0x708090, 0xa0b0c0),
        Seq(Gif.GifFrame(Array.tabulate(20)(_ % 4), 0, 0, 5, 4),
          Gif.GifFrame(Array(1, 2), 1, 1, 2, 1, disposal = 2, transparentIndex = 1))),
        b => Gif.decodeGifFrames(b)),
      ("jpeg", jf, b => Jpeg.decodeJpeg(b)),
      ("mpeg1", Mpeg1.buildMpeg1I(16, 16, IndexedSeq(Mpeg1.Mpeg1Frame(
        Array.tabulate(4)(k => k * 60 % 256), Array(100), Array(200)))),
        b => Mpeg1.decodeMpeg1Frames(b)),
      ("mpeg1p", Mpeg1.buildMpeg1(16, 16, IndexedSeq(
        Mpeg1.IPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(4)(k => 60 + k * 40), Array(100), Array(200))),
        Mpeg1.PPicture(Array(3, -5, 7, -9)))),
        b => Mpeg1.decodeMpeg1Frames(b)),
      ("mpeg1b", Mpeg1.buildMpeg1(16, 16, IndexedSeq(
        Mpeg1.IPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(4)(k => 60 + k * 40), Array(100), Array(200))),
        Mpeg1.PPicture(Array(3, -5, 7, -9)),
        Mpeg1.BPicture(3, Array(5, -3, 9, -7)),
        Mpeg1.BPicture(1, null))),
        b => Mpeg1.decodeMpeg1Frames(b)),
      ("mpeg1d", Mpeg1.buildMpeg1(16, 16, IndexedSeq(
        Mpeg1.DPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(4)(k => k * 60 % 256), Array(100), Array(200))),
        Mpeg1.DPicture(Mpeg1.Mpeg1Frame(
          Array.tabulate(4)(k => 255 - k * 60 % 256), Array(90), Array(30))))),
        b => Mpeg1.decodeMpeg1Frames(b)),
      ("png", Multimodal.buildPng(Array.tabulate(15)(i => i * 0x010203), 5, 3, _ % 5),
        b => Multimodal.decodePng(b)),
      ("wav-g711", Multimodal.buildWavG711(Array.tabulate(64)(_.toByte), aLaw = true),
        b => Multimodal.decodePcmSamples(b)),
      ("gzip", Gzip.buildGzip(Seq(
        "alpha beta gamma".getBytes("UTF-8"),
        "delta epsilon".getBytes("UTF-8"))),
        b => Gzip.decodeGzip(b)),
      ("wav-ima", Multimodal.buildWavIma(Seq(
        (500.toShort, 15, Array[Byte](7, 15, 4, 12, 0, 8, 3, 11)),
        (-300.toShort, 0, Array[Byte](1, 9, 2, 10, 3, 11, 0, 8))), 8),
        b => Multimodal.decodePcmSamples(b)),
      ("avi-rle8", Avi.buildAviRle8(6, 4, 15, 1,
        Array(0x102030, 0x405060, 0x708090),
        IndexedSeq(Array.tabulate(24)(_ % 3),
          Array.tabulate(24)(i => (i / 2) % 3))),
        b => Avi.decodeAviRle8(b)))
    for ((name, bytes, dec) <- valid) {
      var pos = 0
      while (pos < bytes.length) {
        val mut = bytes.clone()
        mut(pos) = (mut(pos) ^ (1 + next() % 255)).toByte
        try dec(mut) catch { case e: Throwable =>
          fail(s"$name threw with byte $pos flipped: $e") }
        pos += 1
      }
      // (c) every truncation length
      var len = 0
      while (len < bytes.length) {
        try dec(bytes.take(len)) catch { case e: Throwable =>
          fail(s"$name threw truncated to $len: $e") }
        len += 1
      }
    }
    // resize stage composes the sniff + codecs: random payloads through
    // the distributed path yield null rows, never task failures
    val junkDf = (1L to 8L).map(i => (i, Array.fill(32 + i.toInt)(next().toByte)))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(junkDf, 3, 2).collect()
    assert(out.length == 8 && out.forall(_.isNullAt(3)))
  }

  test("dedup is idempotent and never increases distinct content") {
    for (texts <- samples(Gen.listOfN(12, text), 10)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val key = sha2(col("text"), 256)
      val once = Dedup.exact(df, key, col("doc_id"))
      val twice = Dedup.exact(once, key, col("doc_id"))
      assert(once.count() == twice.count())
      assert(once.count() == df.select(col("text")).distinct().count())
    }
  }

  test("unigram NLL: invariant under corpus duplication and token order") {
    import graft.operators.TextOps
    for (texts <- samples(Gen.listOfN(8, text), 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def scores(d: org.apache.spark.sql.DataFrame): Map[Long, Double] =
        TextOps.unigramNll(d).collect()
          .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // duplicating every doc doubles every count AND the total, leaving
      // token probabilities — hence every per-doc NLL — exactly unchanged
      val doubled = df.unionByName(df.withColumn("doc_id", col("doc_id") + 1000))
      val sd = scores(doubled)
      assert(scores(df).forall { case (k, v) => sd(k) == v })
      // reversing token order changes nothing: unigram LM is order-blind
      val reversed = df.withColumn("text",
        concat_ws(" ", reverse(split(col("text"), " "))))
      assert(scores(df) == scores(reversed))
    }
  }

  test("sequence packing equals the scalar prefix-sum binning on random corpora") {
    val lens = Gen.listOfN(40, Gen.chooseNum(1, 50))
    for ((xs, i) <- samples(lens, 6).zipWithIndex) {
      val budget = 16L + 13 * i
      val df = xs.zipWithIndex.map { case (n, id) => (id.toLong, n.toLong) }
        .toDF("doc_id", "n")
      val out = graft.operators.Curation.packBins(df, col("n"), budget, partitions = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var cum = 0L // ground truth: single-threaded walk in doc_id order
      xs.zipWithIndex.foreach { case (n, id) =>
        assert(out(id.toLong) == cum / budget, s"doc $id budget $budget")
        cum += n
      }
      assert(out.size == xs.size)
    }
  }

  test("cosine similarity is symmetric, bounded, and 1.0 on self") {
    val pairs = samples(Gen.zip(vec, vec), 10)
    val df = pairs.toDF("a", "b")
    df.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("b"), col("a")).as("ba"),
      Similarity.cosine(col("a"), col("a")).as("aa"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1)) // symmetry, exact
        assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)
        assert(math.abs(r.getDouble(2) - 1.0) <= 1e-6) // self-similarity
      }
  }

  test("batched top-k slices equal single-query ranking: random corpora, forced ties, k > n") {
    for ((vecs, i) <- samples(Gen.listOfN(15, vec), 4).zipWithIndex) {
      // duplicate every vector under a shifted id so every cosine value
      // occurs at least twice — the (cosine desc, vec_id) tie-break is
      // exercised on every row, not just by generator luck
      val rows = vecs.zipWithIndex.flatMap { case (v, id) =>
        Seq((id.toLong, id % 3, v.map(_.toFloat)),
          (id.toLong + 1000L, id % 3, v.map(_.toFloat)))
      }
      val emb = rows.toDF("vec_id", "label", "embedding")
      val qids = Seq(0L, 7L)
      val queries = emb.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("q_emb"))
      val k = 5 + 10 * i // i=3 → k=35 > corpus size 30: returns the full ranking
      val batch = Similarity.topKBatch(emb, queries, k).collect()
      for (qid <- qids) {
        val solo = emb.crossJoin(
            broadcast(queries.filter(col("query_id") === qid)))
          .select(col("vec_id"), col("label"),
            Similarity.cosine(
              transform(col("embedding"), _.cast("double")), col("q_emb")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id")).limit(k).collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
        val slice = batch.filter(_.getAs[Long]("query_id") == qid)
          .sortBy(_.getAs[Int]("rnk"))
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
        assert(slice == solo, s"query $qid k=$k corpus=${rows.size}")
      }
    }
  }

  test("TopKAgg: partition-invariant, equals scalar sort-take, bounded at k") {
    import graft.functions.TopK
    val scoreGen = Gen.listOfN(60, Gen.chooseNum(-5, 5)) // narrow domain → many ties
    for ((ss, i) <- samples(scoreGen, 5).zipWithIndex) {
      val k = 1 + 3 * i
      val rows = ss.zipWithIndex.map { case (s, id) =>
        (id.toLong % 4, s.toDouble, id.toLong) // 4 groups
      }
      val expect = rows.groupBy(_._1).view.mapValues(
        _.map { case (_, s, id) => (s, id) }.sorted.take(k)).toMap
      for (nPart <- Seq(1, 7, 32)) {
        val df = rows.toDF("g", "s", "id").repartition(nPart)
        val got = df.groupBy(col("g"))
          .agg(TopK.topKUdaf(k)(col("s"), col("id"), col("s"), lit(0L), lit(0L)).as("tk"))
          .select(col("g"), col("tk"))
          .collect()
          .map { r =>
            val tk = r.getSeq[org.apache.spark.sql.Row](1)
            assert(tk.length <= k, s"buffer exceeded k=$k")
            // payload rides through unperturbed
            tk.foreach(x => assert(x.getDouble(0) == x.getDouble(2)))
            r.getLong(0) -> tk.map(x => (x.getDouble(0), x.getLong(1)))
          }.toMap
        assert(got.view.mapValues(_.toList).toMap ==
          expect.view.mapValues(_.toList).toMap, s"nPart=$nPart k=$k")
      }
    }
  }

  test("TopK native == typed Aggregator: random, ties, signed zeros, partition-invariant") {
    import graft.functions.{TopK, TopKNative}
    val scoreGen = Gen.listOfN(80, Gen.chooseNum(-5, 5))
    for ((ss, i) <- samples(scoreGen, 4).zipWithIndex) {
      val k = 1 + 4 * i
      // inject signed-zero and duplicate-score rows: the orders must agree
      // on java.lang.Double.compare semantics (-0.0 < 0.0), not just ==
      val rows = ss.zipWithIndex.map { case (s, id) =>
        (id.toLong % 3, s.toDouble, id.toLong)
      } ++ Seq((0L, -0.0, 900L), (0L, 0.0, 901L), (1L, -0.0, 902L),
        (2L, 2.0, 903L), (2L, 2.0, 904L))
      for (nPart <- Seq(1, 13)) {
        val df = rows.toDF("g", "s", "id").repartition(nPart)
        def run(agg: org.apache.spark.sql.Column) =
          df.groupBy(col("g")).agg(agg.as("tk"))
            .select(col("g"), col("tk")).collect()
            .map { r =>
              r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
                .map(x => (x.getDouble(0), x.getLong(1), x.getDouble(2),
                  x.getLong(3), x.getLong(4))).toList
            }.toMap
        val typed = run(TopK.topKUdaf(k)(
          col("s"), col("id"), negate(col("s")), col("id") * 2, lit(7L)))
        val native = run(TopKNative.topK(k)(
          col("s"), col("id"), negate(col("s")), col("id") * 2, lit(7L)))
        // compare with signed-zero sensitivity (tuple == would treat
        // -0.0 == 0.0 as equal and hide an order divergence)
        def bits(m: Map[Long, List[(Double, Long, Double, Long, Long)]]) =
          m.view.mapValues(_.map { case (a, b, c, d, e) =>
            (java.lang.Double.doubleToRawLongBits(a), b,
              java.lang.Double.doubleToRawLongBits(c), d, e) }).toMap
        assert(bits(native) == bits(typed), s"nPart=$nPart k=$k")
      }
    }
  }

  test("BPE training equals the sequential reference on random corpora") {
    import graft.operators.TextOps
    def refMerge(segs: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < segs.length) {
        if (i + 1 < segs.length && segs(i) == l && segs(i + 1) == r) {
          out += l + r; i += 2
        } else { out += segs(i); i += 1 }
      }
      out.toSeq
    }
    // words over a 3-letter alphabet: heavy pair collisions, overlapping
    // self-pairs (aa/bb runs), frequent count ties for the argmax order
    val word3 = Gen.listOfN(6, Gen.oneOf("a", "b", "c")).map(_.mkString)
    for ((ws, i) <- samples(Gen.listOfN(14, word3), 3).zipWithIndex) {
      val weights = ws.distinct.map(w => w -> (1L + (w.length + i) % 3)).toMap
      val docs = weights.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
        .zipWithIndex.map { case (w, j) => (j.toLong, w) }.toDF("doc_id", "text")
      val rounds = 3
      val (_, syms) = TextOps.bpeTrain(docs, rounds)
      var state: Map[String, Seq[String]] =
        weights.keys.map(w => w -> w.map(_.toString): (String, Seq[String])).toMap
      for (_ <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, segs) <- state; k <- 0 until segs.length - 1)
          counts((segs(k), segs(k + 1))) =
            counts.getOrElse((segs(k), segs(k + 1)), 0L) + weights(w)
        if (counts.nonEmpty) {
          val (l, r) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
          state = state.map { case (w, segs) => w -> refMerge(segs, l, r) }
        }
      }
      val got = syms.orderBy(col("word"), col("pos")).collect()
        .groupBy(_.getAs[String]("word"))
        .view.mapValues(_.map(_.getAs[String]("sym")).toSeq).toMap
      assert(got == state, s"sample $i: engine $got\nref $state")
    }
  }

  test("FixedPointSum limb accumulator equals the decimal sum bit-for-bit") {
    // mixed-sign magnitudes spanning the limb boundary region, random
    // partitioning (partial-agg merge order varies), plus null rows
    val vals = Gen.listOfN(60, Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9), Gen.chooseNum(-0.01, 0.01),
      Gen.chooseNum(1e11, 9e11))).map(_.map(x => math.rint(x * 100) / 100))
    for ((xs, i) <- samples(vals, 12).zipWithIndex) {
      val withNulls = xs.map(Option(_)) ++ Seq.fill(i % 3)(None)
      val df = withNulls.toDF("x").repartition(1 + i % 7)
      val got = df.agg(
        Det.dsum(col("x"), 2).as("fast"),
        round(sum(col("x").cast("decimal(30,6)")), 2).cast("double").as("dec"),
        Det.davg(col("x"), 4).as("avg")).collect()(0)
      assert(got.getAs[Any]("fast") == got.getAs[Any]("dec"),
        s"dsum mismatch on $xs: ${got.getAs[Any]("fast")} vs ${got.getAs[Any]("dec")}")
      if (xs.forall(_ >= 0)) { // davg documents the non-negative domain
        val exact = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        val want = if (xs.isEmpty) null
          else (exact / xs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got.getAs[Any]("avg") == want)
      }
    }
    // all-null and empty inputs yield NULL, matching SUM/AVG
    val empty = Seq.empty[Option[Double]].toDF("x")
      .agg(Det.dsum(col("x")).as("s")).collect()(0)
    assert(empty.isNullAt(0))
    // magnitudes where an integral-div/long/double tail would diverge:
    // rounded values beyond 2^53 (inexact in double before the final
    // division) — the decimal tail must stay bit-identical
    val huge = Seq.fill(400)(8.9e12) ++ Seq.fill(137)(1234567.89)
    val h = huge.toDF("x").repartition(5).agg(
      Det.dsum(col("x"), 2).as("fast"),
      round(sum(col("x").cast("decimal(30,6)")), 2).cast("double").as("dec"))
      .collect()(0)
    assert(h.getDouble(0) == h.getDouble(1), s"${h.getDouble(0)} vs ${h.getDouble(1)}")
    // and beyond long-micros range entirely (sum ≈ 3.6e21 µ > 2^63):
    // the limb accumulator must carry where a plain sum(long) overflows
    val beyond = Seq.fill(400)(9.1e12)
    val b = beyond.toDF("x").repartition(3).agg(
      Det.dsum(col("x"), 2).as("fast"),
      round(sum(col("x").cast("decimal(30,6)")), 2).cast("double").as("dec"))
      .collect()(0)
    assert(b.getDouble(0) == b.getDouble(1), s"${b.getDouble(0)} vs ${b.getDouble(1)}")
  }

  test("Det.davg equals BigDecimal HALF_UP average on random inputs") {
    val vals = Gen.listOfN(24, Gen.chooseNum(0.0, 100000.0)
      .map(x => math.rint(x * 100) / 100)) // ≤2-dp fixtures like the real data
    for (xs <- samples(vals, 20); if xs.nonEmpty) {
      val got = xs.toDF("x").agg(Det.davg(col("x"), 4)).collect()(0).getDouble(0)
      // mirror Spark's double→DECIMAL(30,6) cast (shortest-repr BigDecimal,
      // 6-dp HALF_UP), then the mathematically-defined HALF_UP average
      val exact = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val want = (exact / xs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == want, s"davg mismatch on $xs: $got vs $want")
    }
  }

  test("shingles: count is max(0, tokens-n+1), each joins n consecutive tokens") {
    for (t <- samples(text, 15); n <- Seq(2, 3, 5)) {
      val toksArr = t.split(" ").toSeq
      val got = Seq(t).toDF("text")
        .select(Dedup.shingles(Dedup.tokens(col("text")), n).as("s"))
        .collect()(0).getSeq[String](0)
      val want = toksArr.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      assert(got == (if (toksArr.size < n) Seq.empty else want))
    }
  }

  test("unicode tokenizer: punctuated text tokenizes as its space-normalized form") {
    import graft.operators.TextOps
    // words of letters/digits (incl. unicode letters), joined by random
    // punctuation/whitespace separator runs and wrapped in optional
    // leading/trailing junk — the unicode tokenizer must recover exactly
    // the word list, which is what the space tokenizer yields on the
    // clean space-joined form
    val uword = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ß', 'ñ', 'の', '数'))).map(_.mkString)
    val sep = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', ',', '.', ';', '!', '-', '(', ')', '"'))
      .map(_.mkString)
    val cases = Gen.zip(Gen.nonEmptyListOf(uword), sep, Gen.oneOf("", "... "), Gen.oneOf("", "!?"))
    val rows = samples(cases, 40).map { case (words, s, pre, post) =>
      (pre + words.mkString(s) + post, words.mkString(" "))
    }
    val df = rows.toDF("punctuated", "clean")
    val out = df.select(
      TextOps.unicodeTokenizer(col("punctuated")).as("uni"),
      TextOps.spaceTokenizer(col("clean")).as("space")).collect()
    out.zip(rows).foreach { case (r, (p, c)) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"'$p' → ${r.getSeq[String](0)} vs '$c' → ${r.getSeq[String](1)}")
    }
    // and on already-clean text the two tokenizers agree directly
    for (t <- samples(text, 10)) {
      val r = Seq(t).toDF("text").select(
        TextOps.unicodeTokenizer(col("text")).as("u"),
        TextOps.spaceTokenizer(col("text")).as("s")).collect()(0)
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("minhash agreement tracks containment: superset agrees >= disjoint") {
    for (t <- samples(text, 5)) {
      val df = Seq((1L, t), (2L, t + " extra"), (3L, "uno dos tres quatro cinco"))
        .toDF("doc_id", "text")
      val sigs = df.select(col("doc_id") +: Dedup.minhashSig(col("text"), 16): _*)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getString)).toMap
      def agree(x: Seq[String], y: Seq[String]) = x.zip(y).count { case (p, q) => p == q }
      assert(agree(sigs(1L), sigs(2L)) >= agree(sigs(1L), sigs(3L)))
    }
  }

  test("native minhash_sigs == declarative HOF reference, every byte, incl. empty docs") {
    // the production single-pass expression must be bit-identical to the
    // construction the DuckDB oracle replays — differential over the
    // fixture corpus plus hand-built edge docs (empty text, 1 token)
    val fixture = tables.documents.select(col("doc_id"), col("text"))
    val edges = Seq((900001L, ""), (900002L, "solo"), (900003L, "a b a b"))
      .toDF("doc_id", "text")
    val docs = fixture.unionByName(edges)
    val w = 16
    val ref = docs.select(col("doc_id") +: Dedup.minhashSig(col("text"), w): _*)
    val nat = docs.select(col("doc_id"), Dedup.minhashSigsNative(
        Dedup.tokens(col("text")), w).as("__sigs"))
      .select(col("doc_id") +:
        (0 until w).map(i => col("__sigs").getItem(i).as(f"sig_$i%02d")): _*)
    assert(ref.exceptAll(nat).isEmpty && nat.exceptAll(ref).isEmpty)
    // SQL registration path evaluates too
    val viaSql = docs.selectExpr("minhash_sigs(split(text, ' '), 4) AS s")
    assert(viaSql.filter(size(col("s")) === 4).count() == docs.count())
  }

  test("native minhash_sigs_fast == declarative xxhash64 HOF, every lane, incl. empty docs") {
    // the one-pass xxhash64 expression behind l2_minhash_fast must be
    // bit-identical to the built-in form array_min(transform(toks,
    // t => xxhash64(lit(i), t))) — differential over the fixture corpus
    // plus the empty/one-token/duplicate-token edges
    val fixture = tables.documents.select(col("doc_id"), col("text"))
    val edges = Seq((900001L, ""), (900002L, "solo"), (900003L, "a b a b"))
      .toDF("doc_id", "text")
    val docs = fixture.unionByName(edges)
    val w = 16
    val ref = docs.select(col("doc_id") +:
      Dedup.minhashSigFastFromToks(Dedup.tokens(col("text")), w): _*)
    val nat = docs.select(col("doc_id"),
        Dedup.minhashSigsFastNative(Dedup.tokens(col("text")), w).as("__sigs"))
      .select(col("doc_id") +:
        (0 until w).map(i => col("__sigs").getItem(i).as(f"fsig_$i%02d")): _*)
    assert(ref.exceptAll(nat).isEmpty && nat.exceptAll(ref).isEmpty)
  }

  test("native simhash_sig == declarative HOF fold on the fixture corpus + edges") {
    val fixture = tables.documents.select(col("doc_id"), col("text"))
    val edges = Seq((900001L, ""), (900002L, "solo")).toDF("doc_id", "text")
    val docs = fixture.unionByName(edges)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val bad = docs.select(col("doc_id"),
        Dedup.simhashCol(col("toks")).as("nat"),
        Dedup.simhashColDeclarative(col("toks")).as("ref"))
      .filter(!(col("nat") <=> col("ref")))
    assert(bad.isEmpty, bad.collect().take(5).mkString(", "))
  }

  test("native dist2_exact == declarative DECIMAL scaffold on all fixture pairs vs query vec") {
    val t = tables
    val q = t.embeddings.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("q"))
    val pairs = t.embeddings.crossJoin(q)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"), col("q"))
    val bad = pairs.select(col("vec_id"),
        graft.functions.ExactDist2Col(col("e"), col("q")).as("nat"),
        Similarity.dist2Declarative(col("e"), col("q")).as("ref"))
      .filter(!(col("nat") <=> col("ref")))
    assert(bad.isEmpty, bad.collect().take(5).mkString(", "))
  }

  test("native cosine_exact == declarative DECIMAL scaffold, every fixture vector + edges") {
    // all fixture pairs against query vec 0 (the l3 shape) plus edge
    // vectors: zero vector (0/0 → NaN passthrough), mismatched dims → null
    val t = tables
    val q = t.embeddings.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("q"))
    val pairs = t.embeddings.crossJoin(q)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"), col("q"))
    val cmp = pairs.select(col("vec_id"),
      Similarity.cosineDeclarative(col("e"), col("q")).as("ref"),
      Similarity.cosine(col("e"), col("q")).as("nat"))
    val bad = cmp.filter(!(col("ref") <=> col("nat")))
    assert(bad.isEmpty, bad.collect().take(5).mkString(", "))
    val edge = Seq(
      (2L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),        // dim mismatch → null
      (3L, Seq(1e-8, -2e-7, 3.5), Seq(-1e3, 2.25, 0.125)))
      .toDF("id", "a", "b")
    val eBad = edge.select(
        Similarity.cosineDeclarative(col("a"), col("b")).as("ref"),
        Similarity.cosine(col("a"), col("b")).as("nat"))
      .filter(!(col("ref") <=> col("nat")))
    assert(eBad.isEmpty, eBad.collect().mkString(", "))
    // zero-norm input: the declarative form THROWS under ANSI (double
    // divide-by-zero); the native form yields NULL — deliberately not
    // NaN, which would sort FIRST in a descending similarity ranking
    // (no fixture vector has zero norm, so oracle parity is unaffected)
    val z = Seq((1L, Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("nat")).collect()(0)
    assert(z.isNullAt(0))
  }

  test("factored cosineFromParts(dot, na, nb) == fused cosine_exact, fixture + edges") {
    // the norm-factored pairwise form (knnGraph's rescore) must be
    // bit-identical to the fused kernel: exact decimal sums are order-
    // and grouping-independent, and the final double arithmetic is the
    // same expression — pinned over every fixture pair against vec 0
    val t = tables
    val q = t.embeddings.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), _.cast("double")).as("q"))
    val pairs = t.embeddings.crossJoin(q)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"), col("q"))
    val cmp = pairs.select(col("vec_id"),
      Similarity.cosine(col("e"), col("q")).as("fused"),
      Similarity.cosineFromParts(
        graft.functions.ExactDotDecCol(col("e"), col("q")),
        graft.functions.ExactDotDecCol(col("e"), col("e")),
        graft.functions.ExactDotDecCol(col("q"), col("q"))).as("parts"))
    val bad = cmp.filter(!(col("fused") <=> col("parts")))
    assert(bad.isEmpty, bad.collect().take(5).mkString(", "))
    // edges: dim mismatch → null both; zero norm → null both
    val edge = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (2L, Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (3L, Seq(1e-8, -2e-7, 3.5), Seq(-1e3, 2.25, 0.125)))
      .toDF("id", "a", "b")
    val eBad = edge.select(
        Similarity.cosine(col("a"), col("b")).as("fused"),
        Similarity.cosineFromParts(
          graft.functions.ExactDotDecCol(col("a"), col("b")),
          graft.functions.ExactDotDecCol(col("a"), col("a")),
          graft.functions.ExactDotDecCol(col("b"), col("b"))).as("parts"))
      .filter(!(col("fused") <=> col("parts")))
    assert(eBad.isEmpty, eBad.collect().mkString(", "))
  }

  test("native sorted_intersect_size == size(array_intersect) on sorted distinct arrays") {
    // the verification kernel must agree with the declarative reference
    // the oracle replays — randomized differential incl. empty/disjoint
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      def arr() = rnd.shuffle((1 to 40).toList).take(rnd.nextInt(12))
        .map(x => s"w$x").distinct.sorted
      (i.toLong, arr(), arr())
    } :+ ((301L, List.empty[String], List("a"))) :+ ((302L, List.empty[String], List.empty[String]))
    val df = rows.toDF("id", "a", "b")
    val bad = df.filter(
      graft.functions.SortedIntersectSizeCol(col("a"), col("b"))
        =!= size(array_intersect(col("a"), col("b"))))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    // the LONG variant (the triangle-closure kernel) under the same
    // differential, with negative ids in range to exercise signed compare
    val lrows = (1 to 300).map { i =>
      def arr() = rnd.shuffle((-20 to 20).toList).take(rnd.nextInt(12))
        .map(_.toLong).distinct.sorted
      (i.toLong, arr(), arr())
    } :+ ((301L, List.empty[Long], List(3L))) :+ ((302L, List.empty[Long], List.empty[Long]))
    val ldf = lrows.toDF("id", "a", "b")
    val lbad = ldf.filter(
      graft.functions.SortedIntersectSizeCol(col("a"), col("b"))
        =!= size(array_intersect(col("a"), col("b"))))
    assert(lbad.isEmpty, lbad.collect().mkString(", "))
    // mixed types must be rejected loudly, not silently miscounted
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.SortedIntersectSizeCol(col("a"), lit(Array(1L, 2L)))).collect()
    }
  }

  test("fast minhash twin: pure function of the token SET, same containment algebra") {
    for (t <- samples(text, 5)) {
      val toksOf = (c: org.apache.spark.sql.Column) => split(c, " ")
      val df = Seq(
        (1L, t),
        (2L, t.split(" ").reverse.mkString(" ") + " " + t), // same set, permuted + duplicated
        (3L, t + " extra"),
        (4L, "uno dos tres quatro cinco"))
        .toDF("doc_id", "text")
      val sigs = df.select(col("doc_id") +:
          Dedup.minhashSigFastFromToks(toksOf(col("text")), 16): _*)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
      // set-function: permutation + duplication leave every signature fixed
      assert(sigs(1L) == sigs(2L))
      def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count { case (p, q) => p == q }
      // containment ordering holds under the fast family too
      assert(agree(sigs(1L), sigs(3L)) >= agree(sigs(1L), sigs(4L)))
      // disjoint vocabularies disagree somewhere (16 seeded hashes)
      assert(agree(sigs(1L), sigs(4L)) < 16)
    }
  }

  test("misra-gries sketch: undercount bound and heavy-hitter recall under any partitioning") {
    import org.apache.spark.sql.Encoders
    // zipf-ish skew: item i appears ~ 200/(i+1) times; k far below distinct
    val items = (0 until 30).flatMap(i => Seq.fill(200 / (i + 1))(s"item_$i"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    for ((parts, k) <- Seq((1, 8), (7, 8), (16, 8), (7, 5), (7, 16))) {
      val fi = udaf(new graft.functions.FreqItemsAgg(k), Encoders.STRING)
      val est = items.toDF("item").repartition(parts)
        .agg(fi(col("item")).as("s")).select(explode(col("s")))
        .collect().map(r => r.getStruct(0)).map(s => s.getString(0) -> s.getLong(1)).toMap
      val bound = n / (k + 1)
      assert(est.size <= k)
      // every estimate undercounts, by at most n/(k+1)
      for ((item, c) <- est) {
        assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
        assert(truth(item) - c <= bound, s"$item under by ${truth(item) - c} > $bound")
      }
      // every true heavy hitter (> n/(k+1)) is present
      for ((item, t) <- truth if t > bound)
        assert(est.contains(item), s"heavy hitter $item (freq $t > $bound) missing at parts=$parts k=$k")
    }
  }

  test("misra-gries sketch is exact and partition-invariant when capacity covers the domain") {
    import org.apache.spark.sql.Encoders
    val items = (0 until 500).map(i => s"v_${i % 9}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 13)) {
      val fi = udaf(new graft.functions.FreqItemsAgg(16), Encoders.STRING)
      val est = items.toDF("item").repartition(parts)
        .agg(fi(col("item")).as("s")).select(explode(col("s")))
        .collect().map(r => r.getStruct(0)).map(s => s.getString(0) -> s.getLong(1)).toMap
      assert(est == truth, s"parts=$parts")
    }
  }

  test("scd2: intervals tile, compress, and replay the scalar state walk on random logs") {
    val changes = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 40L), Gen.oneOf("a", "b", "c")))
    for (log0 <- samples(changes, 8)) {
      // one observation per (key, t): keep the generator's first
      val log = log0.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val df = log.toDF("k", "t", "v")
      val got = graft.operators.TimeSeries.scd2(df, "k", "t", "v").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      // scalar ground truth: walk each key's changes in time order,
      // opening an interval on every state CHANGE
      val truth = log.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val ordered = rows.sortBy(_._2)
        val opens = ordered.foldLeft(Vector.empty[(Long, String)]) {
          case (acc, (_, t, v)) =>
            if (acc.lastOption.exists(_._2 == v)) acc else acc :+ (t, v)
        }
        opens.zipWithIndex.map { case ((t, v), i) =>
          (k, v, t, opens.lift(i + 1).map(_._1))
        }
      }
      assert(got.sortBy(x => (x._1, x._3)).toSeq == truth.sortBy(x => (x._1, x._3)))
    }
  }

  test("pagerank: distributed rounds equal the scalar reference on random graphs") {
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L)))
      .map(_.filter(e => e._1 != e._2).distinct)
      .suchThat(_.nonEmpty)
    for (und <- samples(edgeGen, 6)) {
      val edges = (und ++ und.map(_.swap)).distinct
      val df = edges.toDF("src", "dst")
      val got = graft.operators.Graph.pageRank(df, iters = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // scalar reference: same integer recurrence
      val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val nodes = out.keySet
      var score = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to 3) {
        val mass = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((s, ds) <- out; d <- ds) mass(d) += score(s) / ds.size
        score = nodes.map(n => n -> (150L * 1000000L + 850L * mass(n)) / 1000L).toMap
      }
      assert(got == score)
    }
  }

  test("dup-span coverage: interval merge == scalar position-set reference on random corpora") {
    // small vocabulary + short spans force genuine cross-doc span
    // collisions; the reference computes covered positions as an explicit
    // set, the engine as a lag-window interval merge — they must agree
    // exactly, including within-doc repeats and overlap chains
    val n = 3
    for (texts <- samples(Gen.listOfN(10, Gen.listOfN(12, word).map(_.mkString(" "))), 8)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.dupSpanCoverage(df, n = n).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("n_dup_spans"), r.getAs[Long]("covered_tokens")))).toMap
      // scalar reference
      val toks = texts.map(_.split(" ").toSeq)
      val allSpans = toks.zipWithIndex.flatMap { case (ts, d) =>
        ts.sliding(n).zipWithIndex.collect {
          case (w, p) if w.length == n => (d.toLong, p + 1, w.mkString(" "))
        }
      }
      val counts = allSpans.groupBy(_._3).view.mapValues(_.size).toMap
      val want = toks.indices.map { d =>
        val dups = allSpans.filter(s => s._1 == d && counts(s._3) > 1)
        val covered = dups.flatMap { case (_, p, _) => p until (p + n) }.toSet.size
        d.toLong -> (dups.size.toLong, covered.toLong)
      }.toMap
      assert(got == want)
    }
  }

  test("media codecs: decode(encode(x)) == x for random samples/pixels, any dims") {
    // unit-level (no Spark plan): the WAV and BMP codecs must be exact
    // inverses for every sample value and for every width (BMP row
    // padding varies with width mod 4 — the property sweeps all four
    // residues), channels, and rate
    import graft.operators.Multimodal
    val shorts = Gen.listOf(Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    for ((xs, i) <- samples(shorts, 24).zipWithIndex) {
      val arr = xs.map(_.toShort).toArray
      val ch = 1 + i % 3
      val rate = 8000 + 997 * (i % 5)
      val got = Multimodal.decodePcmSamples(
        Multimodal.buildWavPcm16(arr, channels = ch, sampleRate = rate))
      assert(got.map(_.toSeq).contains(arr.map(_.toInt).toSeq),
        s"wav roundtrip failed: n=${arr.length} ch=$ch rate=$rate")
    }
    val px = Gen.chooseNum(0, 0xffffff)
    for (i <- 0 until 16) {
      val w = 1 + i % 8 // covers every padding residue w mod 4
      val h = 1 + (i * 3) % 5
      val pixels = samples(Gen.listOfN(w * h, px), 1).head.toArray
      val got = Multimodal.decodeBmp24(Multimodal.buildBmp24(pixels, w, h))
      assert(got.map { case (gw, gh, p) => (gw, gh, p.toSeq) }
        .contains((w, h, pixels.toSeq)), s"bmp roundtrip failed: ${w}x$h")
      // PNG through the SAME random pixels: deflate + per-row filters
      // (offset i cycles which filter each row gets, so the sweep hits
      // every (filter, row-position) combination incl. first-row Paeth)
      val gotPng = Multimodal.decodePng(
        Multimodal.buildPng(pixels, w, h, row => (row + i) % 5))
      assert(gotPng.map { case (gw, gh, p) => (gw, gh, p.toSeq) }
        .contains((w, h, pixels.toSeq)), s"png roundtrip failed: ${w}x$h off=$i")
    }
  }

  test("span-key lanes: appended seed degenerates to f(h1); prepended lane escapes it") {
    // the 128-bit span key's second lane PREPENDS SpanHashSeed2
    // (Dedup.spanStarts). This pins WHY: xxhash64 chains children with
    // the running state as seed, so an APPENDED seed's lane is a pure
    // function of lane 1's output — any lane-1 collision would collide
    // lane 2 too and the widening would buy nothing. Three facts over
    // random token slices:
    //  (a) degeneration witness: xxhash64(slice, seed) ==
    //      XxHash64(Seq(seed), seed = h1(slice)) — append IS f(h1)
    //  (b) the engine's prepended lane differs from that f(h1) chain
    //  (c) the two lanes differ from each other
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val s2 = Dedup.SpanHashSeed2
    for (slices <- samples(Gen.listOfN(40, Gen.listOfN(3, word)), 4)) {
      val rows = slices.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "toks")
        .select(
          xxhash64(col("toks")).as("h1"),
          xxhash64(lit(s2), col("toks")).as("h2_pre"),
          xxhash64(col("toks"), lit(s2)).as("h2_app"))
        .collect()
      rows.foreach { r =>
        val (h1, pre, app) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val fOfH1 = XxHash64(Seq(Literal(s2)), h1).eval(null).asInstanceOf[Long]
        assert(app == fOfH1, "append lane must equal the h1-seeded chain (witness)")
        assert(pre != fOfH1, "prepended lane collapsed into the h1 chain")
        assert(pre != h1, "lanes must differ")
      }
    }
  }

  test("bottom-k distinct sketch: any partitioning × any merge tree == distinct.sorted.take(k)") {
    // unit-level algebra (no Spark plan): fold the input under arbitrary
    // partition boundaries, merge the partials in arbitrary tree shapes —
    // the buffer must be a pure function of the input SET and k, which is
    // exactly what lets the planner map-side combine and AQE re-split it
    import graft.functions.BottomKDistinctAgg
    val elem = Gen.oneOf(Gen.hexStr.map(_.take(6)), word)
    val input = Gen.listOf(Gen.oneOf(elem, Gen.const(null: String)))
    val kGen = Gen.chooseNum(1, 12)
    val inputs = samples(input, 40)
    val ks = samples(kGen, 40)
    for ((xs, seedBase) <- inputs.zipWithIndex) {
      val k = ks(seedBase % ks.size) + seedBase % 3
      val agg = new BottomKDistinctAgg(k)
      val exact = xs.filter(_ != null).distinct.sorted.take(k)
      // arbitrary partitioning: cut points from the seed
      val nCuts = seedBase % 5 + 1
      val parts = xs.grouped(math.max(1, xs.size / nCuts + 1)).toList
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // two merge trees: left fold and pairwise balanced
      val leftFold = partials.foldLeft(agg.zero)(agg.merge)
      def balanced(bs: List[List[String]]): List[String] = bs match {
        case Nil => agg.zero
        case one :: Nil => one
        case more => balanced(more.grouped(2).map {
          case a :: b :: Nil => agg.merge(a, b)
          case a :: Nil => a
          case _ => agg.zero
        }.toList)
      }
      assert(agg.finish(leftFold) == exact, s"seed=$seedBase leftFold")
      assert(agg.finish(balanced(partials)) == exact, s"seed=$seedBase balanced")
    }
  }
}
