package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.EventStream.{mergeAndSplit, SessionState}

/** Pure-function properties of the session merge shared by both
  * sessionizers — no Spark session needed. For random event times and
  * gaps the result must partition the input: every time accounted for,
  * no session spanning an internal gap, consecutive sessions separated
  * by more than the gap, chronological emission order. */
class SessionMergeSpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val timesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))

  test("property: merge/split partitions times into gap-separated sessions") {
    val gapGen = Gen.chooseNum(1L, 20000L)
    (1 to 200).foreach { i =>
      val times = sample(timesGen, i * 7L)
      val gap = sample(gapGen, i * 13L)
      val (closed, open) = mergeAndSplit(None, times, gap)
      val all = closed :+ open
      // counts partition the input
      assert(all.map(_.count).sum === times.size.toLong, s"seed $i")
      // each session is internally gap-free over the times it covers
      val sorted = times.sorted
      all.foreach { s =>
        val inside = sorted.filter(t => t >= s.firstTs && t <= s.lastTs)
        val internalGaps = inside.zip(inside.drop(1)).map { case (a, b) => b - a }
        assert(internalGaps.forall(_ <= gap), s"seed $i: internal gap > $gap in $s")
      }
      // consecutive sessions are separated by MORE than the gap
      all.zip(all.drop(1)).foreach { case (a, b) =>
        assert(b.firstTs - a.lastTs > gap,
          s"seed $i: sessions $a and $b should have merged at gap $gap")
      }
      // chronological and non-overlapping
      assert(all.map(_.firstTs) === all.map(_.firstTs).sorted, s"seed $i")
      all.foreach(s => assert(s.firstTs <= s.lastTs, s"seed $i"))
    }
  }

  test("property: folding batch-by-batch equals one merged batch") {
    // split the same time set into arbitrary consecutive batches: the
    // (closed ++ open) session set must be identical to the single-shot
    // result — micro-batch boundaries must never change sessionization
    val gap = 500L
    (1 to 100).foreach { i =>
      val times = sample(timesGen, 1000L + i).sorted
      val cut = sample(Gen.chooseNum(1, times.size), 2000L + i)
      val (batch1, batch2) = times.splitAt(cut)
      val oneShot = mergeAndSplit(None, times, gap)
      val incremental = {
        val (c1, open1) = mergeAndSplit(None, batch1, gap)
        if (batch2.isEmpty) (c1, open1)
        else {
          val (c2, open2) = mergeAndSplit(Some(open1), batch2, gap)
          (c1 ++ c2, open2)
        }
      }
      assert(incremental._1 :+ incremental._2 === oneShot._1 :+ oneShot._2,
        s"seed $i: batch boundary at $cut changed sessionization")
    }
  }

  test("prev state beyond the gap closes with its own stats intact") {
    val prev = SessionState(count = 3, firstTs = 0L, lastTs = 100L)
    val (closed, open) = mergeAndSplit(Some(prev), Seq(5000L), gapMs = 1000L)
    assert(closed === Seq(prev))
    assert(open === SessionState(1L, 5000L, 5000L))
  }
}
