package graft

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
}
