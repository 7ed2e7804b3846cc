package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Parity and valve-placement specs for the exchange-free banded probe
  * ([[graft.ops.Dedup.minhashIndexDedupBatchBanded]] over
  * [[graft.ops.Dedup.minhashIndexBands]]): output pair-for-pair
  * identical to the unified probe, with the documented valve shift —
  * per-side instead of combined bucket membership — as the ONLY
  * divergence. */
class MinhashBandedSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("banded probe ≡ unified probe, pair for pair, over every pair class") {
    // the OpsSpec incremental fixture: random docs + planted near-dups
    // arranged so every pair class exists — old×old (must NOT emit),
    // old×new, new×new, identical-text sets spanning the boundary
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val base = (1L to 30L).map { i =>
      (i, Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = (1L to 8L).map { i => (100L + i, base(i.toInt - 1)._2 + " tail") }
    val copies = Seq((301L, base(0)._2), (202L, base(0)._2))
    val all = (base ++ planted ++ copies).toDF("doc_id", "text")
    val isNew = col("doc_id") % 2 === 0
    val index = Dedup.minhashIndexBuild(all.where(!isNew), "doc_id", "text",
      shingleK = 5)
    val bands = Dedup.minhashIndexBands(index)
    val batch = all.where(isNew)
    val unified = pairSet(Dedup.minhashIndexDedupBatch(index, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3))
    val banded = pairSet(Dedup.minhashIndexDedupBatchBanded(index, bands, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3))
    // the fixture is live (cross-boundary identical pairs present,
    // old×old suppressed) and the two probes agree exactly
    assert(unified.contains((1L, 202L, 1.0)) && unified.contains((202L, 301L, 1.0)))
    assert(!unified.exists(p => p._1 == 1L && p._2 == 301L))
    assert(unified.nonEmpty && banded === unified)
    // minPairBands tightening flows through both paths identically
    val unified2 = pairSet(Dedup.minhashIndexDedupBatch(index, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3, minPairBands = 3))
    val banded2 = pairSet(Dedup.minhashIndexDedupBatchBanded(index, bands, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3, minPairBands = 3))
    assert(banded2 === unified2)
    // edges: an empty batch probes to nothing through the bands table
    assert(Dedup.minhashIndexDedupBatchBanded(index, bands,
      batch.where(lit(false)), "doc_id", "text", shingleK = 5,
      threshold = 0.3).count() === 0L)
    // an empty index (and its empty bands frame) makes the probe a
    // plain self-dedup of the batch — same as the unified path
    val emptyIdx = Dedup.minhashIndexBuild(all.where(lit(false)),
      "doc_id", "text", shingleK = 5)
    assert(pairSet(Dedup.minhashIndexDedupBatchBanded(emptyIdx,
      Dedup.minhashIndexBands(emptyIdx), batch, "doc_id", "text",
      shingleK = 5, threshold = 0.3)) ===
      pairSet(Dedup.minhashVerifiedDups(batch, "doc_id", "text",
        threshold = 0.3)))
    spark.catalog.clearCache()
  }

  test("valve placement is the only divergence: a combined-overflow bucket refuses unified, passes banded") {
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    // four DISTINCT near-dup docs — two indexed, two in the batch —
    // collide in (at least) one band bucket with combined membership 4,
    // but only 2 per side: a valve of 3 refuses the UNIFIED probe's
    // combined bucket aggregation, while the banded path's per-side
    // valves (index buckets at build, batch buckets at probe) never see
    // more than 2
    val baseText = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu").mkString(" ")
    val docs = Seq(
      (1L, baseText + " one"), (3L, baseText + " three"),   // index side
      (2L, baseText + " two"), (4L, baseText + " four"))    // batch side
      .toDF("doc_id", "text")
    val corpus = docs.where(col("doc_id") % 2 === 1)
    val batch = docs.where(col("doc_id") % 2 === 0)
    val index = Dedup.minhashIndexBuild(corpus, "doc_id", "text",
      shingleK = 5, maxGroupSize = 3)
    // the fixture must actually overflow a combined bucket: some
    // (band, bucket) holds all four gids across the two sides
    val combinedMax = index
      .select(element_at(col("ids"), 1).as("gid"), col("sig"))
      .unionByName(Dedup.minhashIndexBuild(batch, "doc_id", "text",
        shingleK = 5, maxGroupSize = 3)
        .select(element_at(col("ids"), 1).as("gid"), col("sig")))
      .select(col("gid"), posexplode(Dedup.bandBuckets(col("sig"),
        Dedup.DefaultNumBands, Dedup.DefaultRowsPerBand))
        .as(Seq("band", "bucket")))
      .groupBy("band", "bucket").agg(countDistinct("gid").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(combinedMax === 4L,
      s"fixture must produce a 4-member combined bucket, got $combinedMax")
    val e = intercept[Exception](Dedup.minhashIndexDedupBatch(index, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3,
      maxGroupSize = 3).count())
    assert(chain(e).exists(m => m.contains("over maxGroupSize=3") &&
      m.contains("minhashIndexDedupBatch")), s"wrong error: $e")
    // the banded path serves the same probe: index buckets (≤2) valve
    // at build, batch buckets (≤2) at probe — and the output equals the
    // unified probe run at a valve wide enough for the combined bucket
    val bands = Dedup.minhashIndexBands(index, maxGroupSize = 3)
    val banded = pairSet(Dedup.minhashIndexDedupBatchBanded(index, bands,
      batch, "doc_id", "text", shingleK = 5, threshold = 0.3,
      maxGroupSize = 3))
    val reference = pairSet(Dedup.minhashIndexDedupBatch(index, batch,
      "doc_id", "text", shingleK = 5, threshold = 0.3))
    assert(reference.nonEmpty && banded === reference)
    // symmetric check: one SIDE overflowing trips the banded valves too
    // (the valve moved, it didn't vanish) — 4 distinct near-dups all in
    // the batch overflow the batch's own bucket aggregation
    val wideBatch = docs // all four docs arrive as the batch
    val be = intercept[Exception](Dedup.minhashIndexDedupBatchBanded(
      Dedup.minhashIndexBuild(docs.where(lit(false)), "doc_id", "text",
        shingleK = 5, maxGroupSize = 3),
      Dedup.minhashIndexBands(Dedup.minhashIndexBuild(
        docs.where(lit(false)), "doc_id", "text", shingleK = 5,
        maxGroupSize = 3), maxGroupSize = 3),
      wideBatch, "doc_id", "text", shingleK = 5, threshold = 0.3,
      maxGroupSize = 3).count())
    assert(chain(be).exists(m => m.contains("over maxGroupSize=3") &&
      m.contains("minhashIndexDedupBatchBanded")), s"wrong error: $be")
    // and the index-side valve fires at BUILD time, in minhashIndexBands
    // (consume the member list as the probe's candidate join does — a
    // bare count() prunes the unused aggregate, by design: the valve
    // rides the projection that consumes the list)
    val ie = intercept[Exception](Dedup.minhashIndexBands(
      Dedup.minhashIndexBuild(docs, "doc_id", "text", shingleK = 5,
        maxGroupSize = 3), maxGroupSize = 3)
      .select(explode(col("gids"))).count())
    assert(chain(ie).exists(m => m.contains("over maxGroupSize=3") &&
      m.contains("minhashIndexBands")), s"wrong error: $ie")
    spark.catalog.clearCache()
  }
}
