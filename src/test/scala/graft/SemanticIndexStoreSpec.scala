package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, SemanticIndexStore}

/** Protocol + lifecycle specs for [[graft.ops.SemanticIndexStore]] —
  * the versioned SemDeDup index: init/append/probe against standing
  * centroids, batch-split invariance of the append, reload bit-parity,
  * and the shared VersionedState refusal rules (stale base, pin
  * missing, prune keeps the head). */
class SemanticIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }
  private def jitter(v: Array[Float]): Array[Float] = {
    val w = v.clone(); w(0) = w(0) + 0.01f; w
  }
  private def vecs(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("sem-store").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("lifecycle: standing centroids survive appends; probes find dups against corpus AND folded batches") {
    withDir { dir =>
      val corpus = vecs((0L until 100L).map(i => (i, base(i.toInt))): _*)
      assert(SemanticIndexStore.init(corpus, dir, "vec_id", "embedding",
        nlist = 8) === 0L)
      val v0 = SemanticIndexStore.read(spark, dir)
      assert((v0.meta.dim, v0.meta.nlist, v0.meta.maxGroupSize) ===
        ((16, 8, graft.ops.Dedup.DefaultMaxGroupSize)))
      // the persisted train-time drift reference is a real profile:
      // ordered quantiles inside the cosine-distance range
      assert(v0.meta.assignP50 >= 0.0 && v0.meta.assignP50 <= v0.meta.assignP99
        && v0.meta.assignP99 <= 2.0)
      // batch 1: a near-dup of corpus member 3 plus a fresh vector
      val b1 = vecs((201L, jitter(base(3))), (202L, base(500)))
      val p1 = pairSet(SemanticIndexStore.probeLatest(spark, dir, b1,
        "vec_id", "embedding", threshold = 0.9))
      assert(p1.contains((3L, 201L)))
      assert(SemanticIndexStore.append(spark, dir, b1,
        "vec_id", "embedding", 0L) === 1L)
      // batch 2: near-dups of a corpus member AND of batch-1's fresh
      // vector — the latter is only findable if append folded b1 in —
      // plus an exact copy of corpus member 7 (identical-vector merge)
      val b2 = vecs((301L, jitter(base(5))), (302L, jitter(base(500))),
        (303L, base(7)))
      val p2 = pairSet(SemanticIndexStore.probeLatest(spark, dir, b2,
        "vec_id", "embedding", threshold = 0.9))
      assert(p2.contains((5L, 301L)), "corpus near-dup must pair")
      assert(p2.contains((202L, 302L)), "batch-1 near-dup must pair — append dropped it?")
      assert(p2.contains((7L, 303L)), "identical copy must pair")
      // sided: nothing internal to the standing index re-emits
      val newIds = Set(301L, 302L, 303L)
      assert(p2.forall(p => newIds(p._1) || newIds(p._2)))
      // the standing CENTROIDS never changed across appends (retraining
      // is an explicit rebuild, never a maintenance side effect)
      assert(SemanticIndexStore.append(spark, dir, b2,
        "vec_id", "embedding", 1L) === 2L)
      assert(SemanticIndexStore.read(spark, dir).centroids === v0.centroids)
      // appends are deltas: 7 (the v=0 snapshot) and its exact copy 303
      // (the v=2 delta) sit in separate chain links until compaction
      // folds the chain — THEN the identical-vector merge collapses
      // them into one group (and the centroids still never changed)
      assert(SemanticIndexStore.compact(spark, dir) === 3L)
      assert(SemanticIndexStore.read(spark, dir).centroids === v0.centroids)
      val cells = SemanticIndexStore.read(spark, dir).cells
      val g7 = cells.where(array_contains(col("ids"), 7L))
        .select("ids").collect()
      assert(g7.length === 1 && g7(0).getSeq[Long](0) === Seq(7L, 303L))
    }
  }

  test("append is batch-split invariant: two appends equal one combined append, row for row") {
    withDir { dir =>
      val corpus = vecs((0L until 60L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val loaded = SemanticIndexStore.read(spark, dir)
      val b1 = vecs((201L, jitter(base(3))), (202L, base(500)), (203L, base(7)))
      val b2 = vecs((301L, jitter(base(500))), (302L, base(7)))
      def rows(df: DataFrame) = df
        .select("cell", "gid", "vv", "vn", "ids").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2),
          r.getDouble(3), r.getSeq[Long](4))).toSet
      val stepwise = Similarity.semanticIndexAppend(loaded.centroids,
        Similarity.semanticIndexAppend(loaded.centroids, loaded.cells,
          b1, "vec_id", "embedding"),
        b2, "vec_id", "embedding")
      val combined = Similarity.semanticIndexAppend(loaded.centroids,
        loaded.cells, b1.unionByName(b2), "vec_id", "embedding")
      assert(rows(stepwise) === rows(combined))
      // the fixture exercises a three-way identical-vector merge
      // (corpus 7 + batch1 203 + batch2 302)
      assert(rows(combined).exists(_._5 == Seq(7L, 203L, 302L)))
    }
  }

  test("protocol refusals: init on a standing index, stale append, missing pin, prune keeps the head") {
    withDir { dir =>
      val corpus = vecs((0L until 40L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val re = intercept[IllegalArgumentException] {
        SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      }
      assert(re.getMessage.contains("already holds committed versions"))
      // empty corpus refuses by name instead of writing a dead index
      val ee = intercept[IllegalArgumentException] {
        SemanticIndexStore.init(corpus.where(lit(false)), s"$dir-empty",
          "vec_id", "embedding", nlist = 8)
      }
      assert(ee.getMessage.contains("trained no centroids"))
      SemanticIndexStore.append(spark, dir, vecs((201L, base(500))),
        "vec_id", "embedding", 0L)
      val stale = intercept[IllegalArgumentException] {
        SemanticIndexStore.append(spark, dir, vecs((202L, base(501))),
          "vec_id", "embedding", 0L)
      }
      assert(stale.getMessage.contains("another maintainer already advanced"))
      val missing = intercept[IllegalArgumentException] {
        SemanticIndexStore.read(spark, dir, Some(9L))
      }
      assert(missing.getMessage.contains("no committed version v=9"))
      // prune: v=1 and v=2 are DELTAS whose chain reaches v=0, so the
      // floor clamps to the chain base and nothing is deletable yet;
      // compaction introduces a full v=3 and the folded chain becomes
      // reclaimable. A pruned pin then fails by name and pruning the
      // head itself refuses.
      SemanticIndexStore.append(spark, dir, vecs((203L, base(502))),
        "vec_id", "embedding", 1L)
      assert(SemanticIndexStore.prune(spark, dir, keepFrom = 2L) === Seq.empty)
      assert(SemanticIndexStore.compact(spark, dir) === 3L)
      assert(SemanticIndexStore.prune(spark, dir, keepFrom = 3L) ===
        Seq(0L, 1L, 2L))
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(3L))
      val pruned = intercept[IllegalArgumentException] {
        SemanticIndexStore.read(spark, dir, Some(0L))
      }
      assert(pruned.getMessage.contains("no committed version v=0"))
      val head = intercept[IllegalArgumentException] {
        SemanticIndexStore.prune(spark, dir, keepFrom = 5L)
      }
      assert(head.getMessage.contains("refusing to prune the head"))
      // the kept full head still probes alone
      assert(pairSet(SemanticIndexStore.probeLatest(spark, dir,
        vecs((401L, jitter(base(3)))), "vec_id", "embedding",
        threshold = 0.9)).contains((3L, 401L)))
    }
  }

  test("delta appends: O(batch) writes, chain-union probe parity, compact folds and no-ops") {
    withDir { dir =>
      val corpus = vecs((0L until 60L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val loaded0 = SemanticIndexStore.read(spark, dir)
      val b1 = vecs((201L, jitter(base(3))), (202L, base(500)))
      // b2 carries an exact copy of corpus member 7 — the same vector
      // value in two different chain links
      val b2 = vecs((301L, jitter(base(500))), (302L, base(7)))
      SemanticIndexStore.append(spark, dir, b1, "vec_id", "embedding", 0L)
      SemanticIndexStore.append(spark, dir, b2, "vec_id", "embedding", 1L)
      // the delta version's frame holds ONLY the batch's own ids — the
      // O(batch) write-mass claim, checked against the bytes on disk
      val v1Ids = spark.read.parquet(s"$dir/v=1/cells")
        .select(explode(col("ids"))).collect().map(_.getLong(0)).toSet
      assert(v1Ids === Set(201L, 202L))
      // chain-union probe ≡ probe against the in-memory MERGED frame —
      // including a batch doc whose near-dup twin lives in a non-head
      // chain link (202 in v=1) and one whose identical-vector twins
      // span two links (7 in v=0, 302 in v=2)
      val batch = vecs((401L, jitter(base(11))), (402L, base(500)),
        (403L, base(7)))
      val mergedCells = Similarity.semanticIndexAppend(loaded0.centroids,
        Similarity.semanticIndexAppend(loaded0.centroids, loaded0.cells,
          b1, "vec_id", "embedding"),
        b2, "vec_id", "embedding")
      def scored(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = scored(Similarity.semanticDedupBatch(loaded0.centroids,
        mergedCells, batch, "vec_id", "embedding", threshold = 0.9))
      assert(expected.exists(p => p._1 == 202L && p._2 == 402L))
      assert(expected.exists(p => p._1 == 302L && p._2 == 403L))
      assert(scored(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9)) === expected)
      // compact folds the chain into a full head that probes
      // identically; compacting a full head is a no-op
      assert(SemanticIndexStore.compact(spark, dir) === 3L)
      assert(scored(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9)) === expected)
      assert(SemanticIndexStore.compact(spark, dir) === 3L)
      // the folded frame is ONE row per distinct vector again: the
      // cross-link identical copy's value carries a merged member list
      val folded = spark.read.parquet(s"$dir/v=3/cells")
      assert(folded.select("vv").distinct().count() === folded.count())
      val g7 = folded.where(array_contains(col("ids"), 7L))
        .select("ids").collect()
      assert(g7.length === 1 && g7(0).getSeq[Long](0) === Seq(7L, 302L))
    }
  }

  test("tombstone removal: probe equals the standing-centroid probe over corpus-minus-removed; compact applies and clears") {
    withDir { dir =>
      val corpus = vecs((0L until 60L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val loaded0 = SemanticIndexStore.read(spark, dir)
      // b1 plants an exact copy of corpus member 7 (an identical-vector
      // group split across two links) plus a fresh vector
      val b1 = vecs((201L, base(7)), (202L, base(500)))
      SemanticIndexStore.append(spark, dir, b1, "vec_id", "embedding", 0L)
      // remove member 7 (its group keeps survivor 201) and the whole
      // fresh vector 202 — one id from each link
      assert(SemanticIndexStore.remove(spark, dir,
        Seq(7L, 202L).toDF("vec_id"), "vec_id", 1L) === 2L)
      assert(SemanticIndexStore.liveTombs(spark, dir).collect()
        .map(_.getLong(0)).toSet === Set(7L, 202L))
      // the batch probes near-dups of both removed docs: pairs naming
      // them must not emit; their surviving twins still pair. Oracle =
      // the SAME standing centroids over the corpus-minus-removed
      // assignment (retraining would redraw cells — removal must not)
      val batch = vecs((401L, jitter(base(7))), (402L, jitter(base(500))),
        (403L, base(11)))
      def scored(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val survivorCells = Similarity.semanticAssign(loaded0.centroids,
        corpus.where(col("vec_id") =!= 7L)
          .unionByName(b1.where(col("vec_id") =!= 202L)),
        "vec_id", "embedding")
      val expected = scored(Similarity.semanticDedupBatch(loaded0.centroids,
        survivorCells, batch, "vec_id", "embedding", threshold = 0.9))
      assert(expected.exists(p => p._1 == 201L && p._2 == 401L),
        "the surviving twin must still pair")
      assert(!expected.exists(p => p._1 == 7L || p._1 == 202L
        || p._2 == 7L || p._2 == 202L))
      val got = scored(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9))
      assert(got === expected)
      // pinned BELOW the remove link: versioned time travel still
      // pairs against the removed docs
      val pinned = scored(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9, version = Some(1L)))
      assert(pinned.exists(p => p._1 == 7L && p._2 == 401L))
      // compact applies the tombstones to the merged member lists (the
      // split group keeps only its survivor; the fully-removed value
      // vanishes) and clears the debt — and probes identically after
      assert(SemanticIndexStore.compact(spark, dir) === 3L)
      assert(SemanticIndexStore.liveTombs(spark, dir).isEmpty)
      assert(!new java.io.File(s"$dir/v=3/tombs").exists)
      val folded = spark.read.parquet(s"$dir/v=3/cells")
      val foldedIds = folded.select(explode(col("ids"))).collect()
        .map(_.getLong(0)).toSet
      assert(!foldedIds.contains(7L) && !foldedIds.contains(202L))
      assert(foldedIds.contains(201L))
      // the split group's gid re-derived as its surviving minimum
      val g201 = folded.where(array_contains(col("ids"), 201L)).collect()
      assert(g201.length === 1 &&
        g201(0).getAs[Long]("gid") === 201L &&
        g201(0).getAs[Seq[Long]]("ids") === Seq(201L))
      assert(scored(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9)) === expected)
      // protocol: empty removal no-ops; a replayed remove refuses stale
      assert(SemanticIndexStore.remove(spark, dir,
        Seq.empty[Long].toDF("vec_id"), "vec_id", 3L) === 3L)
      val stale = intercept[IllegalArgumentException] {
        SemanticIndexStore.remove(spark, dir,
          Seq(9L).toDF("vec_id"), "vec_id", 1L)
      }
      assert(stale.getMessage.contains("another maintainer already advanced"))
    }
  }

  test("removing the entire corpus fails the compact by name — never a committed empty index") {
    withDir { dir =>
      val corpus = vecs((0L until 20L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 4)
      SemanticIndexStore.remove(spark, dir,
        corpus.select("vec_id"), "vec_id", 0L)
      val e = intercept[Exception] { SemanticIndexStore.compact(spark, dir) }
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(msgs(e).exists(_.contains("EMPTY index")), s"wrong error: $e")
      // nothing committed; probes still run and find nothing — every
      // standing row is tombstoned
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(1L))
      assert(SemanticIndexStore.probeLatest(spark, dir,
        vecs((999L, base(3))), "vec_id", "embedding",
        threshold = 0.9).count() === 0L)
    }
  }

  test("valve placement: a group split across links appends fine and fails the compact by name") {
    withDir { dir =>
      // identical vectors → one group; the PERSISTED maxGroupSize=3
      // (set once at init — appends, compacts, and probes all read it
      // from the meta, so a maintainer cannot loosen it) admits each
      // link's sub-group but not the merged mass. Two spare distinct
      // vectors give k-means something to train on.
      def clones(ids: Long*): DataFrame = vecs(ids.map((_, base(7))): _*)
      val corpus = clones(1L, 2L)
        .unionByName(vecs((50L, base(50)), (51L, base(51))))
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding",
        nlist = 4, maxGroupSize = 3)
      // after init alone the chain is healthy: one link, group at 2 ≤ 3
      val healthy = SemanticIndexStore.chainHealth(spark, dir)
      assert(healthy.chainLength === 1 && healthy.maxMergedGroup === 2L
        && !healthy.groupValveExceeded)
      SemanticIndexStore.append(spark, dir, clones(11L, 12L),
        "vec_id", "embedding", 0L)
      // the read-only health check sees the merged pressure FIRST —
      // exact mass 4 over valve 3 — before any compact trips on it
      val pressured = SemanticIndexStore.chainHealth(spark, dir)
      assert(pressured.chainLength === 2 && pressured.maxMergedGroup === 4L)
      assert(pressured.groupValveExceeded,
        "chainHealth must read the merged valve as exceeded before the compact")
      // per-link the valve never fires (2 ≤ 3 each side); the merged
      // group (4 > 3) fails the scheduled compact, never a probe
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      val e = intercept[Exception] {
        SemanticIndexStore.compact(spark, dir)
      }
      assert(msgs(e).exists(m => m.contains("over maxGroupSize=3") &&
        m.contains("semanticCellsMerge")), s"wrong error: $e")
      // the failed compact commits nothing: the head is still the delta
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(1L))
      // ...and the chain still probes (both split sub-groups pair with
      // an arriving clone)
      val got = pairSet(SemanticIndexStore.probeLatest(spark, dir,
        clones(21L), "vec_id", "embedding", threshold = 0.9))
      assert(got === Set((1L, 21L), (2L, 21L), (11L, 21L), (12L, 21L)))
    }
  }

  test("a re-dimensioned batch fails append and probe by name instead of silently vanishing") {
    withDir { dir =>
      val corpus = vecs((0L until 40L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 4)
      // without the valve the assignment kernel would commit these
      // rows into the FIRST cell with null cosines everywhere — rows
      // no probe ever pairs, with zero errors anywhere
      val wrong = Seq((501L, Array.fill(8)(0.1f))).toDF("vec_id", "embedding")
      val ea = intercept[IllegalArgumentException] {
        SemanticIndexStore.append(spark, dir, wrong, "vec_id", "embedding", 0L)
      }
      assert(ea.getMessage.contains("dimension 8..8") &&
        ea.getMessage.contains("dim=16"), s"wrong error: ${ea.getMessage}")
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(0L),
        "the refused append must commit nothing")
      val ep = intercept[IllegalArgumentException] {
        SemanticIndexStore.probeLatest(spark, dir, wrong,
          "vec_id", "embedding", threshold = 0.9)
      }
      assert(ep.getMessage.contains("dim=16"))
      // an EMPTY batch append is a no-op, not a chain link: an empty
      // cell-partitioned write would commit a FILE-LESS frame that
      // poisons every later chain read at schema inference
      assert(SemanticIndexStore.append(spark, dir, corpus.where(lit(false)),
        "vec_id", "embedding", 0L) === 0L)
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(0L))
      assert(SemanticIndexStore.read(spark, dir).cells.count() > 0)
    }
  }

  test("reload bit-parity: a reloaded version probes identically to the in-memory build") {
    withDir { dir =>
      val corpus = vecs((0L until 80L).map(i => (i, base(i.toInt))): _*)
      val (centroids, cells) = Similarity.semanticIndexBuild(
        corpus, "vec_id", "embedding", nlist = 8)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val batch = vecs((201L, jitter(base(3))), (202L, base(11)),
        (203L, jitter(base(42))))
      def full(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inMemory = full(Similarity.semanticDedupBatch(centroids, cells,
        batch, "vec_id", "embedding", threshold = 0.9))
      val fromStore = full(SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9))
      assert(inMemory.nonEmpty && fromStore === inMemory)
    }
  }

  test("drift report: in-distribution batch stays quiet, shifted batch fires, reference survives appends") {
    withDir { dir =>
      // training corpus: 4 TIGHT clusters around fixed directions, so
      // the persisted train profile has small assign distances and the
      // p99 is a meaningful in-distribution ceiling
      def member(cluster: Int, i: Int): Array[Float] = {
        val c = base(cluster * 1000)
        val rnd = new scala.util.Random(cluster * 1000 + i)
        c.map(x => x + 0.02f * (rnd.nextFloat() - 0.5f))
      }
      val corpus = vecs((for { k <- 0 until 4; i <- 0 until 50 }
        yield ((k * 50 + i).toLong, member(k, 500 + i))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      // more members of the SAME clusters: quiet — the beyond-p99
      // fraction sits near the p99's own 1% mass
      val inDist = SemanticIndexStore.driftReport(spark, dir,
        vecs((0 until 40).map(i => ((900 + i).toLong, member(i % 4, 9000 + i))): _*),
        "embedding")
      assert(inDist.scoredRows === 40L)
      assert(inDist.fracBeyondTrainP99 <= 0.2,
        s"in-distribution batch must stay quiet: $inDist")
      // full-space random directions the tight clusters never occupied:
      // nearly every vector assigns far beyond the train p99 — the
      // rebuild trigger (SCALE.md "Centroid drift") fires
      def randomDir(i: Int): Array[Float] = {
        val rnd = new scala.util.Random(777000 + i)
        Array.fill(16)(rnd.nextFloat() * 2 - 1)
      }
      val drifted = SemanticIndexStore.driftReport(spark, dir,
        vecs((0 until 40).map(i => ((1900 + i).toLong, randomDir(i))): _*),
        "embedding")
      assert(drifted.fracBeyondTrainP99 >= 0.6,
        s"shifted batch must fire: $drifted")
      assert(drifted.batchP50 > drifted.trainP99)
      // the train-time reference copies forward through appends: the
      // centroids stand, so the drift yardstick must not move
      SemanticIndexStore.append(spark, dir,
        vecs((0 until 10).map(i => ((2900 + i).toLong, member(i % 4, 20000 + i))): _*),
        "vec_id", "embedding", 0L)
      val after = SemanticIndexStore.driftReport(spark, dir,
        vecs((0 until 5).map(i => ((3900 + i).toLong, member(i % 4, 30000 + i))): _*),
        "embedding")
      assert(after.trainP50 === inDist.trainP50 && after.trainP99 === inDist.trainP99)
      // a batch with zero scorable vectors fails by name — an
      // unmeasurable batch must not read as "no drift"
      val e = intercept[IllegalArgumentException] {
        SemanticIndexStore.driftReport(spark, dir,
          Seq((1L, null.asInstanceOf[Array[Float]]),
            (2L, Array.fill(16)(0f))).toDF("vec_id", "embedding"),
          "embedding")
      }
      assert(e.getMessage.contains("no scorable vectors"))
    }
  }

  test("probe I/O: cell-partitioned layout; the standing scan partition-prunes to the batch's cells") {
    withDir { dir =>
      val corpus = vecs((0L until 80L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val cellDirs = new java.io.File(s"$dir/v=0/cells").listFiles()
        .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
      assert(cellDirs.nonEmpty, "cells frame is not cell-partitioned on disk")
      // 31 delta links on top: the probe below reads a 32-link chain —
      // a year of ~11-day appends between compactions, the longest
      // shape ChainReadBench measures — and EVERY link's scan must
      // still prune to the batch's touched cells (the per-link filter
      // rides readCellChain, so it must not degrade with chain length)
      (0 until 31).foreach { i =>
        assert(SemanticIndexStore.append(spark, dir,
          vecs(((101 + i).toLong, base(101 + i))),
          "vec_id", "embedding", i.toLong) === (i + 1).toLong)
      }
      val batch = vecs((201L, jitter(base(3))), (202L, base(11)))
      val probe = SemanticIndexStore.probeLatest(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.9)
      probe.count() // materialize through AQE so final scans are planned
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
          case im: InMemoryTableScanExec => im +: allNodes(im.relation.cachedPlan)
          case n => Seq(n)
        }
      val cellScans = allNodes(probe.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
      }
      assert(cellScans.nonEmpty, "no file scan over the cells path found")
      (0 until 32).foreach { v =>
        assert(cellScans.exists(_.relation.location.rootPaths.exists(
          _.toString.contains(s"v=$v/"))), s"no cells scan over chain link v=$v")
      }
      cellScans.foreach { s =>
        assert(s.partitionFilters.nonEmpty && s.partitionFilters.mkString.contains("cell"),
          s"standing cells scan is not partition-pruned:\n$s")
      }
    }
  }
}
