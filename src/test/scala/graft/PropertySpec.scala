package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.gold.Dims
import graft.ops.{Dedup, Projections, TextOps}

/** Property-based checks for the invariants SURVEY.md §5 calls out:
  * dedup idempotence, surrogate-key density, parse-format roundtrips.
  * Drives ScalaCheck generators directly (fixed seeds — deterministic)
  * so no scalatestplus bridge is needed in the offline environment. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.oneOf("the", "cat", "dog", "spark", "data", "fast", "slow", "x1")
  private val textGen = Gen.listOfN(12, word).map(_.mkString(" "))

  test("property: exact dedup is idempotent") {
    samples(Gen.listOfN(30, textGen), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = Dedup.exactKeepFirst(df, "text", "id")
      val twice = Dedup.exactKeepFirst(once, "text", "id")
      assert(once.count() === twice.count())
      assert(once.select("id").except(twice.select("id")).count() === 0)
      // survivors are exactly one per distinct text
      assert(once.count() === texts.distinct.length)
    }
  }

  test("property: blocked edit linkage equals the naive all-pairs reference") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)(
        (i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // short noisy strings over a tiny alphabet — edit-near pairs are
    // common, so the property is never vacuous
    val noisy = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val rowGen = for { b <- Gen.oneOf("X", "Y"); v <- noisy } yield (b, v)
    samples(Gen.listOfN(40, rowGen), 5).zipWithIndex.foreach { case (rows, i) =>
      val maxDist = 1 + i % 3
      val df = rows.toDF("blk", "name")
      val got = Dedup.editNearDups(df, "name", Seq("blk"), maxDist)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getLong(4), r.getLong(5))).toSet
      val support = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = (for {
        ((ba, va), (bb, vb)) <- {
          val ds = rows.distinct
          for (x <- ds; y <- ds if x._1 == y._1 && x._2 < y._2) yield (x, y)
        }
        d = lev(va, vb) if d <= maxDist
      } yield (ba, va, vb, d, support((ba, va)), support((bb, vb)))).toSet
      assert(got === want)
      assert(want.nonEmpty || rows.distinct.size <= 1, // non-vacuity guard
        s"degenerate sample $i produced no pairs: ${rows.take(5)}")
    }
  }

  test("property: surrogate keys are dense 1..N for any input") {
    val keyGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    samples(keyGen, 5).foreach { keys =>
      val dim = Dims.surrogateDim(keys.toDF("nk"), "nk", "sk")
      val got = dim.select("sk").as[Long].collect().sorted
      assert(got.toSeq === (1L to keys.distinct.length).toSeq)
    }
  }

  test("property: %y pivot roundtrips dates in 1969-2068") {
    val dates = samples(Gen.choose(0L, 365L * 99), 20)
      .map(java.time.LocalDate.of(1969, 1, 1).plusDays(_))
      .filter(_.getYear <= 2068)
    val df = dates.map(_.toString).toDF("iso")
      .select(to_date(col("iso")).as("d"))
      .select(col("d"), Projections.safeParseDate2(
        date_format(col("d"), "dd-MM-yy")).as("roundtrip"))
    df.collect().foreach(r => assert(r.getDate(1) === r.getDate(0)))
  }

  test("property: token count equals word count under messy spacing") {
    samples(Gen.listOfN(8, word), 10).foreach { words =>
      val df = Seq(words.mkString("  ")).toDF("t") // double spaces too
      assert(df.select(TextOps.tokenCount(col("t"))).as[Int].head() === words.length)
    }
  }

  test("property: discrete quantiles are data elements, ordered, p=1 is max") {
    import graft.ops.Stats
    val valsGen = Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
    samples(valsGen, 8).foreach { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val r = Stats.quantilesDisc(df, Seq("g"), "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0)).collect()(0)
      val (p25, p50, p100) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(Seq(p25, p50, p100).forall(vs.contains)) // type-1: always an element
      assert(p25 <= p50 && p50 <= p100)               // monotone in p
      assert(p100 === vs.max)
    }
  }

  test("property: weightedMix multiplicity matches per-stratum weights") {
    import graft.ops.Mix
    val weightGen = Gen.choose(0, 3200).map(_ / 1000.0) // 0.000..3.200
    samples(Gen.zip(weightGen, weightGen), 6).foreach { case (wa, wb) =>
      val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
        .toDF("id", "s")
      val got = Mix.weightedMix(df, "s", Map("a" -> wa, "b" -> wb), col("id"))
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((stratum, w) <- Seq("a" -> wa, "b" -> wb)) {
        val n = 200.0
        val fullRows = w.toLong * n
        val frac = math.round((w - w.toLong) * 1000) / 1000.0
        val gotRows = got.getOrElse(stratum, 0L).toDouble
        // full epochs are exact; the fractional epoch is a deterministic
        // ~frac share of the stratum (bucket spread, not a coin flip)
        assert(gotRows >= fullRows && gotRows <= fullRows + n)
        if (frac == 0.0) assert(gotRows === fullRows)
        else assert(math.abs((gotRows - fullRows) / n - frac) <= 0.15,
          s"stratum $stratum weight $w: got $gotRows rows")
      }
    }
  }

  // ---- native text-hash kernel ⇔ composed-builtin bit parity ----
  // The native expressions in graft.functions.TextHashExpressions
  // replace interpreted HOF trees; these properties pin BIT parity
  // against the exact composed forms they replaced. Parity is
  // load-bearing: minhash/jaccard oracle hashes and the recorded
  // 10×/100× CandProbe candidate counts are functions of these values.

  /** The pre-native composed form of [[Dedup.shingleHashed]]'s per-row
    * expression, kept here as the parity reference. */
  private def composedWindowHashes(text: Column, k: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(n < k, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), n - k + 1),
        i => xxhash64(slice(toks, i, lit(k)))))
  }

  /** The pre-native composed form of [[TextOps.fingerprint]]. */
  private def composedFingerprint(text: Column, k: Int, n: Int): Column =
    slice(array_sort(array_distinct(
      transform(Dedup.shingles(text, k), s => xxhash64(s)))), 1, n)

  /** The pre-native composed form of
    * [[Dedup.minhashSignatureFromHashes]]. */
  private def composedMinhashSig(hashes: Column, numHashes: Int): Column = {
    val seeds = typedlit((0 until numHashes).toArray)
    aggregate(hashes,
      typedlit(Array.fill(numHashes)(Long.MaxValue)),
      (acc, h) => zip_with(acc, seeds, (a, s) => least(a, xxhash64(s, h))))
  }

  /** Messy corpus: unicode tokens, tab/newline separators (matched by
    * \s+ but NOT by trim, which strips spaces only — so a leading tab
    * makes an empty first token), non-breaking space (neither), plus
    * the degenerate shapes (null, empty, single token, < k tokens). */
  private val messyTexts: Seq[String] = {
    val tok = Gen.oneOf("the", "cat", "Straße", "日本語", "x1", "a b",
      "naïve", "🙂ok", "-", "2024-01-01")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")
    val doc = for {
      n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, tok)
      seps <- Gen.listOfN(math.max(n - 1, 0), sep)
      lead <- Gen.oneOf("", " ", "\t", "  ")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString + trail
    samples(doc, 60) ++ Seq("", " ", "\t", "one", "one two three four",
      "a a a a a a a a", "の の の の の の")
  }

  /** Both expressions over the corpus (plus a NULL row), equal under
    * null-safe comparison, in whole-stage codegen AND interpreted
    * mode — the native kernels route both paths through one compute
    * method, but the argument plumbing differs. */
  private def assertColumnsAgree(native: Column, composed: Column): Unit = {
    val df = (messyTexts.map(Option(_)) :+ None).toDF("text")
      .select(native.as("a"), composed.as("b"))
    for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = df.where(!(col("a") <=> col("b")))
        assert(diff.count() === 0,
          s"wholeStage=$wholeStage: ${diff.take(3).mkString("; ")}")
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("property: native TokenWindowHashes is bit-identical to the composed HOF form") {
    for (k <- Seq(1, 2, 5))
      assertColumnsAgree(
        graft.functions.TextHashFunctions.token_window_hashes(col("text"), k),
        composedWindowHashes(col("text"), k))
  }

  test("property: native ShingleFingerprint is bit-identical to the composed HOF form") {
    for ((k, n) <- Seq((5, 8), (2, 3), (1, 8)))
      assertColumnsAgree(
        graft.functions.TextHashFunctions.shingle_fingerprint(col("text"), k, n),
        composedFingerprint(col("text"), k, n))
  }

  test("property: native MinHashSignature is bit-identical to the composed fold") {
    // signatures over real shingle frames (the operator pipeline shape)
    for ((k, nh) <- Seq((5, 16), (2, 4)))
      assertColumnsAgree(
        graft.functions.TextHashFunctions.minhash_signature(
          graft.functions.TextHashFunctions.token_window_hashes(col("text"), k), nh),
        composedMinhashSig(composedWindowHashes(col("text"), k), nh))
    // plus handcrafted hash arrays: empty (MaxValue init) and null
    val arrays: Seq[Option[Seq[Long]]] =
      Seq(Some(Seq(1L, -5L, Long.MaxValue, 0L)), Some(Seq.empty[Long]), None,
        Some(Seq(Long.MinValue)), Some((1L to 40L).toSeq))
    val df = arrays.toDF("h").select(
      graft.functions.TextHashFunctions.minhash_signature(col("h"), 8).as("a"),
      composedMinhashSig(col("h"), 8).as("b"))
    assert(df.where(!(col("a") <=> col("b"))).count() === 0)
  }

  test("property: native SigMatchCount is bit-identical to the composed screen form") {
    // the minhash estimate screen it replaces:
    // size(filter(zip_with(a, b, _ === _), identity))
    def composed(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => x === y), x => x))
    // signature-shaped pairs from the real pipeline (equal-length,
    // non-null elements) plus every parity edge: null arrays, empty
    // arrays, UNEQUAL lengths (zip_with pads with nulls — only the
    // overlapping prefix can count), and null ELEMENTS (comparison is
    // null, dropped by the filter)
    val pairs: Seq[(Option[Seq[java.lang.Long]], Option[Seq[java.lang.Long]])] = {
      def L(xs: Long*): Option[Seq[java.lang.Long]] = Some(xs.map(Long.box))
      Seq(
        (L(1L, 2L, 3L), L(1L, 9L, 3L)),
        (L(1L, 2L, 3L), L(1L, 2L, 3L)),
        (L(), L()),
        (L(1L, 2L, 3L), L(1L, 2L)), // unequal: only overlap counts
        (L(7L), L(7L, 7L, 7L)),
        (None, L(1L, 2L)), (L(1L, 2L), None), (None, None),
        (Some(Seq[java.lang.Long](1L, null, 3L)),
          Some(Seq[java.lang.Long](1L, null, 3L))), // null elems drop
        (Some(Seq[java.lang.Long](null)), L(0L)),
        (L(Long.MinValue, Long.MaxValue, 0L),
          L(Long.MinValue, Long.MaxValue, 1L))) ++
        samples(for {
          n <- Gen.choose(0, 12)
          a <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
          b <- Gen.listOfN(n, Gen.oneOf(a :+ 0L)) // force some matches
        } yield (L(a: _*), L(b: _*)), 40)
    }
    val df = pairs.toDF("a", "b").select(
      graft.functions.TextHashFunctions
        .sig_match_count(col("a"), col("b")).as("x"),
      composed(col("a"), col("b")).as("y"))
    for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = df.where(!(col("x") <=> col("y").cast("int")))
        assert(diff.count() === 0,
          s"wholeStage=$wholeStage: ${diff.take(3).mkString("; ")}")
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("property: native LshBandBuckets is bit-identical to the composed banding form") {
    import graft.ops.Similarity
    // random vectors plus the parity edge shapes: a NULL vector and a
    // wrong-length vector (the composed form's dot yields NULL there, so
    // every sign bit is 0 — all-zero buckets, NOT a null row)
    val dim = 16
    val coord = Gen.chooseNum(-10.0, 10.0)
    val vecs: Seq[Option[Seq[Double]]] =
      samples(Gen.listOfN(dim, coord).map(l => Option(l.toSeq)), 40) ++
        Seq(None, Some(Seq(1.0, 2.0)), Some(Seq.empty[Double]),
          Some(Seq.fill(dim)(0.0)), Some(Seq.fill(dim)(-0.0)),
          // NaN dot: Spark's nan-safe >= makes it bit 1, not 0
          Some(Seq.fill(dim)(Double.NaN)),
          Some(Double.PositiveInfinity +: Seq.fill(dim - 1)(1.0)),
          Some(Double.NegativeInfinity +: Seq.fill(dim - 1)(1.0)))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vid", "vv")
    for ((planes, tables, seedBase) <- Seq((4, 12, 1000), (8, 3, 2000), (1, 1, 7))) {
      for (wholeStage <- Seq("true", "false")) {
        spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
        try {
          val kernel = Similarity.lshBanded(df, "vid", "vv", dim, planes, tables, seedBase)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          val composed = Similarity.lshBandedComposed(df, "vid", "vv", dim, planes, tables, seedBase)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          assert(kernel === composed,
            s"wholeStage=$wholeStage planes=$planes tables=$tables")
          // the null-vector quirk is pinned, not accidental: bucket 0 in
          // every table (vid of the None row is vecs.indexOf(None))
          val nullVid = vecs.indexWhere(_.isEmpty).toLong
          assert(kernel.filter(_._1 == nullVid).map(_._3) === Set(0L))
        } finally spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    }
  }

  test("property: native text-stat kernels are bit-identical to the composed quality family") {
    import graft.ops.TextOps
    // whole-function parity (counts AND the double arithmetic on top)
    // over the shared messy corpus, both codegen modes
    assertColumnsAgree(TextOps.tokenCount(col("text")),
      TextOps.tokenCountComposed(col("text")))
    assertColumnsAgree(TextOps.bpeishTokenCount(col("text")),
      TextOps.bpeishTokenCountComposed(col("text")))
    assertColumnsAgree(TextOps.punctRatio(col("text")),
      TextOps.punctRatioComposed(col("text")))
    assertColumnsAgree(TextOps.digitRatio(col("text")),
      TextOps.digitRatioComposed(col("text")))
    assertColumnsAgree(TextOps.stopwordRatio(col("text")),
      TextOps.stopwordRatioComposed(col("text")))
    // extra whitespace edges the shared corpus lacks: VT and FF are \s
    // to Java regex (so they split AND don't count as punct), NBSP is
    // NOT \s (one token, one punct char); all-separator and
    // stopword-only strings hit the leading/trailing empty-token rules
    val edges = Seq("a\u000Bb", "a\fb", "\u000B", "\f\f", "\u00A0",
      "x y", "the", " the ", "\tthe\n", "the the and of", "THE The the",
      "a-b.c,d", "12 34 5a", "İstanbul ŞEHİR straße", "🙂 🙂 🙂", ". . .")
    val df = (edges.map(Option(_)) :+ None).toDF("t").select(
      TextOps.tokenCount(col("t")).as("k1"),
      TextOps.tokenCountComposed(col("t")).as("c1"),
      TextOps.bpeishTokenCount(col("t")).as("k2"),
      TextOps.bpeishTokenCountComposed(col("t")).as("c2"),
      TextOps.punctRatio(col("t")).as("k3"),
      TextOps.punctRatioComposed(col("t")).as("c3"),
      TextOps.digitRatio(col("t")).as("k4"),
      TextOps.digitRatioComposed(col("t")).as("c4"),
      TextOps.stopwordRatio(col("t")).as("k5"),
      TextOps.stopwordRatioComposed(col("t")).as("c5"),
      TextOps.qualityScore(col("t")).as("k6"))
    for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val bad = df.where(!(col("k1") <=> col("c1")) || !(col("k2") <=> col("c2")) ||
          !(col("k3") <=> col("c3")) || !(col("k4") <=> col("c4")) ||
          !(col("k5") <=> col("c5")))
        assert(bad.count() === 0, s"wholeStage=$wholeStage: ${bad.take(3).mkString("; ")}")
        df.collect() // qualityScore column evaluates without error in both modes
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("property: grouped lshTopK is row-identical to the ungrouped reference") {
    import graft.ops.Similarity
    // corpus with planted duplicate cliques (grouping's reason to
    // exist), scaled copies of some vectors (equal cosine to every
    // query → cross-GROUP score ties at the top-k boundary), and
    // queries drawn from inside cliques (self-exclusion inside a group)
    val rnd = new scala.util.Random(7)
    val distinct = (0 until 40).map(_ => Array.fill(8)(rnd.nextGaussian()))
    val rows = for {
      (v, i) <- distinct.zipWithIndex
      c <- 0 until (i % 5 + 1) // clique sizes 1..5
    } yield (i.toLong + c * 1000L, v.toSeq)
    val scaled = distinct.take(6).zipWithIndex.map { case (v, i) =>
      (5000L + i, v.map(_ * 2.0).toSeq) }
    // zero vectors score NULL against every query (Spark's non-ANSI
    // divide-by-zero; ANSI raises identically in both forms). NULLs
    // sort LAST in the descending rank but still fill trailing top-k
    // slots when non-null candidates run out — a ≥k clique of them
    // forces the boundary score itself to NULL, where an ordinary
    // comparison is always false and only the null-safe <=> keeps the
    // tied groups
    val zeros = (0 until 7).map(i => (6000L + i, Seq.fill(8)(0.0)))
    val df = (rows ++ scaled ++ zeros).toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 8 || col("vec_id") === 6000L)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      for (k <- Seq(1, 5, 1000)) {
        def resultRows(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            if (r.isNullAt(3)) "null" else r.getDouble(3).toString)).toSet
        val grouped = resultRows(Similarity.lshTopK(df, q, "vec_id", "embedding", dim = 8, k = k))
        val reference = resultRows(Similarity.lshTopKUngrouped(df, q, "vec_id", "embedding", dim = 8, k = k))
        assert(grouped === reference, s"k=$k")
        spark.catalog.clearCache()
      }
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("Bench.summarize: failure sentinels never deflate the headline total") {
    // a failed query records -1.0; the artifact total must be the sum
    // of the SUCCESSFUL timings with failures surfaced as a count
    assert(Bench.summarize(Seq("a" -> 2.0, "b" -> -1.0, "c" -> 3.5)) === ((5.5, 1)))
    assert(Bench.summarize(Seq("a" -> -1.0, "b" -> -1.0)) === ((0.0, 2)))
    assert(Bench.summarize(Nil) === ((0.0, 0)))
    assert(Bench.summarize(Seq("a" -> 0.0, "b" -> 1.25)) === ((1.25, 0)))
    // invariant over random mixes: total is non-negative and counts add up
    val timing = Gen.oneOf(Gen.choose(0.0, 30.0), Gen.const(-1.0))
    samples(Gen.listOf(timing), 20).foreach { ts =>
      val results = ts.zipWithIndex.map { case (t, i) => (s"q$i", t) }
      val (total, errors) = Bench.summarize(results)
      assert(total >= 0.0)
      assert(errors >= 0 && errors <= results.size)
      assert(total >= results.map(_._2).sum) // dropping negatives can only raise the sum
    }
  }

  test("Bench.median: failure sentinels dropped, -1.0 only when every rep failed") {
    assert(Bench.median(Seq(3.0)) === 3.0)
    assert(Bench.median(Seq(9.0, 1.0, 4.0)) === 4.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
    // one crashed rep must not drag the median negative
    assert(Bench.median(Seq(-1.0, 5.0, 7.0)) === 6.0)
    assert(Bench.median(Seq(-1.0, -1.0)) === -1.0)
    assert(Bench.median(Nil) === -1.0)
    // property: for all-successful reps the median is an order statistic
    // bounded by min and max, and permutation-invariant
    samples(Gen.nonEmptyListOf(Gen.choose(0.0, 30.0)), 20).foreach { ts =>
      val m = Bench.median(ts)
      assert(m >= ts.min && m <= ts.max)
      assert(Bench.median(scala.util.Random.shuffle(ts)) === m)
    }
  }

  test("property: sketch heavy hitters equal the exact answer for any skew and any sketch shape") {
    // soundness must not depend on the data distribution or on the
    // sketch being well-sized: CMS one-sided error ⇒ screen complete,
    // exact verify ⇒ result exact — even a 1×2 sketch only inflates
    // the candidate band
    import graft.ops.Sketch
    val keyGen = Gen.frequency(
      6 -> Gen.const("whale"), 2 -> Gen.const("midsize"),
      4 -> Gen.oneOf((0 until 50).map(i => s"tail_$i")))
    samples(Gen.listOfN(300, keyGen), 4).zipWithIndex.foreach { case (keys, i) =>
      val df = keys.toDF("k0")
      val exact = df.groupBy("k0").count()
        .where(col("count") * 20 >= lit(keys.size.toLong))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((d, w) <- Seq((1, 2), (2, 16), (5, 512))) {
        val got = Sketch.heavyHitters(df, col("k0"), supportDenom = 20,
          depth = d, width = w)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === exact, s"sample $i, sketch ${d}x$w")
      }
    }
  }

  test("property: bpe encode is lossless and length-bounded for random corpora") {
    // for any corpus and any merge budget: concat(tokens) == the
    // whitespace-stripped doc, and words <= tokens <= non-space chars
    import graft.functions.BpeFunctions.bpe_encode
    samples(Gen.listOfN(12, textGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val merges = TextOps.bpeLearnMerges(docs, "text", numMerges = 15)
      val rows = docs.select(
        lower(trim(col("text"))).as("lt"),
        bpe_encode(lower(trim(col("text"))), merges).as("toks"))
        .select(
          (array_join(col("toks"), "") === regexp_replace(col("lt"), "\\s+", ""))
            .as("lossless"),
          size(filter(split(col("lt"), "\\s+"), t => t =!= "")).as("nw"),
          size(col("toks")).as("nt"),
          length(regexp_replace(col("lt"), "\\s+", "")).as("nc"))
        .collect()
      rows.foreach { r =>
        assert(r.getBoolean(0), "lossless violated")
        assert(r.getInt(1) <= r.getInt(2) && r.getInt(2) <= r.getInt(3),
          s"token bounds violated: ${r.toSeq}")
      }
    }
  }

  test("property: span cut conserves tokens and cuts only duplicated mass") {
    // kept + cut == total tokens per doc, and a corpus with no repeated
    // L-gram anywhere cuts nothing
    samples(Gen.listOfN(6, textGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cut = Dedup.cutSpans(docs, "doc_id", "text", L = 5)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      val totals = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+", -1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      totals.foreach { case (id, n) =>
        val (kept, cutN) = cut(id)
        assert(kept + cutN === n, s"doc $id: $kept + $cutN != $n")
      }
      spark.catalog.clearCache()
    }
    // all-unique corpus: nothing to cut
    val uniq = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val c = Dedup.cutSpans(uniq, "doc_id", "text", L = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(c === Map(1L -> 0L, 2L -> 0L))
    spark.catalog.clearCache()
  }

  test("property: tombstone output-filtering equals probing a fresh build over corpus-minus-removed") {
    // the removal contract's purity argument
    // (MinhashIndexStore.remove), generalized beyond the fixed
    // fixtures: for ANY corpus, batch, and removal subset, dropping
    // the probe's output pairs that touch removed ids is pair-for-pair
    // a probe against an index freshly built over corpus-minus-removed.
    // A tiny vocabulary makes near-dup pairs (and removed near-dup
    // partners) arise by chance across the trials.
    val corpusIds = (1L to 14L).toVector
    // documents are mutations of a few shared base texts, so identical
    // and 1-token-edit near-dup pairs arise densely in every trial
    def docFrom(bases: Seq[List[String]]): Gen[String] = for {
      b <- Gen.oneOf(bases)
      mutate <- Gen.oneOf(true, false)
      pos <- Gen.choose(0, b.size - 1)
      w <- word
    } yield (if (mutate) b.updated(pos, w) else b).mkString(" ")
    val trialGen = for {
      bases <- Gen.listOfN(3, Gen.listOfN(8, word))
      corpusTexts <- Gen.listOfN(corpusIds.size, docFrom(bases))
      batchTexts <- Gen.listOfN(6, docFrom(bases))
      removed <- Gen.someOf(corpusIds)
    } yield (corpusTexts, batchTexts, removed.toSet)
    var sawPairs = false
    var sawRemovedPair = false
    samples(trialGen, 6).foreach { case (corpusTexts, batchTexts, removed) =>
      val corpus = corpusIds.zip(corpusTexts).toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex
        .map { case (t, i) => (101L + i, t) }.toDF("doc_id", "text")
      val index = Dedup.minhashIndexBuild(corpus, "doc_id", "text",
        shingleK = 5, numBands = 24, rowsPerBand = 2)
      val bands = Dedup.minhashIndexBands(index, numBands = 24, rowsPerBand = 2)
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = pairs(Dedup.minhashIndexDedupBatchBanded(index, bands,
        batch, "doc_id", "text", shingleK = 5, numBands = 24,
        rowsPerBand = 2, threshold = 0.5))
      val filtered = full.filterNot(p => removed(p._1) || removed(p._2))
      val minusR = corpus.where(!col("doc_id").isin(removed.toSeq: _*))
      val freshIndex = Dedup.minhashIndexBuild(minusR, "doc_id", "text",
        shingleK = 5, numBands = 24, rowsPerBand = 2)
      val fresh = pairs(Dedup.minhashIndexDedupBatchBanded(freshIndex,
        Dedup.minhashIndexBands(freshIndex, numBands = 24, rowsPerBand = 2),
        batch, "doc_id", "text", shingleK = 5, numBands = 24,
        rowsPerBand = 2, threshold = 0.5))
      assert(filtered === fresh,
        s"removed=$removed full=$full fresh=$fresh")
      sawPairs ||= full.nonEmpty
      sawRemovedPair ||= (full.size != filtered.size)
      spark.catalog.clearCache()
    }
    // non-vacuity: the trials actually exercised pairs AND removal hits
    assert(sawPairs, "no trial produced near-dup pairs — vocabulary too wide")
    assert(sawRemovedPair,
      "no trial removed a pair endpoint — the property never bit")
  }

  test("property: keep-first survivors match the reference rule for any pair graph") {
    import graft.streaming.IngestProtocol
    val batchIds = (100L to 111L).toVector
    val corpusIds = (1L to 8L).toVector
    // arbitrary near-dup pair graphs touching the batch: each pair links
    // a batch doc to a corpus doc or to another batch doc
    val pairGen = Gen.listOfN(14, for {
      x <- Gen.oneOf(batchIds)
      y <- Gen.oneOf(batchIds ++ corpusIds)
      if y != x
    } yield (math.min(x, y), math.max(x, y)))
    samples(pairGen, 8).foreach { rawPairs =>
      val pairs = rawPairs.distinct
      val batchSet = batchIds.toSet
      // the reference rule, in plain Scala: rejected iff some pair links
      // the doc to a non-batch partner or to a smaller batch id — one
      // pass, no transitive rescue of docs whose rejecter was rejected
      val expected = batchIds.filterNot { b =>
        pairs.exists { case (x, y) =>
          (x == b && !batchSet(y)) || (y == b && !batchSet(x)) ||
            (y == b && batchSet(x))
        }
      }.toSet
      val batchDf = batchIds.map(i => (i, s"payload-$i")).toDF("doc_id", "text")
      val pairsDf = pairs.toDF("id_a", "id_b")
      val got = IngestProtocol.keepFirstSurvivors(batchDf, pairsDf, "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected, s"pairs: $pairs")
    }
    // the empty graph keeps everything
    val all = IngestProtocol.keepFirstSurvivors(
      batchIds.map(i => (i, "t")).toDF("doc_id", "text"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(all === batchIds.toSet)
  }
}
