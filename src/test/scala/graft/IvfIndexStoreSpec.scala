package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{IvfIndexStore, Similarity}

/** Protocol + lifecycle specs for [[graft.ops.IvfIndexStore]]: the
  * versioned IVF ANN index — standing centroids survive appends, new
  * batches become retrievable, reload probes bit-identically, and the
  * shared VersionedState refusal rules hold. */
class IvfIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }
  private def vecs(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-store").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("lifecycle: appended vectors become retrievable; centroids stand; reload probes bit-identically") {
    withDir { dir =>
      val corpus = vecs((0L until 200L).map(i => (i, base(i.toInt))): _*)
      assert(IvfIndexStore.init(corpus, dir, "vec_id", "embedding",
        nlist = 8) === 0L)
      val v0 = IvfIndexStore.read(spark, dir)
      assert((v0.meta.dim, v0.meta.nlist, v0.meta.full) === ((16, 8, true)))
      // the persisted train-time drift reference is a real profile:
      // ordered quantiles inside the cosine-distance range
      assert(v0.meta.assignP50 >= 0.0 && v0.meta.assignP50 <= v0.meta.assignP99
        && v0.meta.assignP99 <= 2.0)
      // a probe for an exact copy of corpus member 5 finds it (the
      // identical vector shares the argmin cell — the ivfTopK contract)
      val q5 = vecs((999L, base(5)))
      def top1(df: DataFrame): Long =
        df.orderBy("rank").limit(1).collect()(0).getLong(1)
      assert(top1(IvfIndexStore.probeLatest(spark, dir, q5,
        "vec_id", "embedding", k = 3, nprobe = 2)) === 5L)
      // append a batch holding a NEW vector; a probe for its copy must
      // now retrieve it — only possible if append folded the batch in
      // under the standing centroids
      val b1 = vecs((501L, base(900)), (502L, base(901)))
      assert(IvfIndexStore.append(spark, dir, b1, "vec_id", "embedding", 0L) === 1L)
      val q900 = vecs((998L, base(900)))
      assert(top1(IvfIndexStore.probeLatest(spark, dir, q900,
        "vec_id", "embedding", k = 3, nprobe = 8)) === 501L)
      // centroids never changed across the append
      assert(IvfIndexStore.read(spark, dir).centroids === v0.centroids)
      // reload parity: the store probe equals ivfProbe over the loaded
      // frames (same rows, same scores), and a pinned v=0 still serves
      val loaded = IvfIndexStore.read(spark, dir)
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(rows(IvfIndexStore.probeLatest(spark, dir, q900,
        "vec_id", "embedding", k = 3, nprobe = 8)) ===
        rows(Similarity.ivfProbe(loaded.centroids, loaded.cells, q900,
          "vec_id", "embedding", k = 3, nprobe = 8)))
      assert(IvfIndexStore.read(spark, dir, Some(0L)).version === 0L)
      // append assignment matches build assignment for the same rows:
      // batch rows assigned by ivfAssign carry the same cells the
      // standing frame holds for identical vectors
      val copyOf5 = Similarity.ivfAssign(vecs((777L, base(5))),
        "vec_id", "embedding", v0.centroids)
        .select("cell").head().getLong(0)
      val cell5 = v0.cells.where(col("corpus_id") === 5L)
        .select("cell").head().getLong(0)
      assert(copyOf5 === cell5)
    }
  }

  test("probe I/O: cell-partitioned layout; the scan partition-prunes to the touched cells") {
    withDir { dir =>
      val corpus = vecs((0L until 200L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      // the on-disk layout is cell directories, not a flat frame
      val cellDirs = new java.io.File(s"$dir/v=0/cells").listFiles()
        .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
      assert(cellDirs.nonEmpty && cellDirs.subsetOf(
        (0 until 8).map(i => s"cell=$i").toSet), s"unexpected layout: $cellDirs")
      // the touched-cell set is the probe's static filter, bounded by
      // nlist and derived from the SAME assignment kernel the probe uses
      val q = vecs((999L, base(5)))
      val touched = Similarity.ivfProbeCells(q, "embedding",
        IvfIndexStore.read(spark, dir).centroids, nprobe = 2)
      assert(touched.size === 2 && touched.forall(c => c >= 0 && c < 8))
      val probe = IvfIndexStore.probeLatest(spark, dir, q,
        "vec_id", "embedding", k = 3, nprobe = 2)
      // plan pin: every file scan under the probe that reads the cells
      // path carries a non-empty partition filter — the corpus read is
      // nprobe/nlist of the bytes, never a full scan a join discards
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
          case n => Seq(n)
        }
      val cellScans = allNodes(probe.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
      }
      assert(cellScans.nonEmpty, "no file scan over the cells path found")
      cellScans.foreach { s =>
        assert(s.partitionFilters.nonEmpty,
          s"cells scan is not partition-pruned:\n$s")
        assert(s.partitionFilters.mkString.contains("cell"),
          s"partition filter is not on the cell column:\n${s.partitionFilters}")
      }
      // and the pruned probe still answers: member 5's copy is found
      assert(probe.orderBy("rank").limit(1).collect()(0).getLong(1) === 5L)
    }
  }

  test("protocol refusals: standing init, empty corpus, stale append, missing pin, prune keeps head") {
    withDir { dir =>
      val corpus = vecs((0L until 60L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val re = intercept[IllegalArgumentException] {
        IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      }
      assert(re.getMessage.contains("already holds committed versions"))
      val ee = intercept[IllegalArgumentException] {
        IvfIndexStore.init(corpus.where(lit(false)), s"$dir-empty",
          "vec_id", "embedding", nlist = 8)
      }
      assert(ee.getMessage.contains("trained no centroids"))
      IvfIndexStore.append(spark, dir, vecs((501L, base(900))),
        "vec_id", "embedding", 0L)
      val stale = intercept[IllegalArgumentException] {
        IvfIndexStore.append(spark, dir, vecs((502L, base(901))),
          "vec_id", "embedding", 0L)
      }
      assert(stale.getMessage.contains("another maintainer already advanced"))
      val missing = intercept[IllegalArgumentException] {
        IvfIndexStore.read(spark, dir, Some(9L))
      }
      assert(missing.getMessage.contains("no committed version v=9"))
      IvfIndexStore.append(spark, dir, vecs((503L, base(902))),
        "vec_id", "embedding", 1L)
      // deltas clamp the prune floor: v=2's chain bottoms out at the
      // v=0 full base, so a keepFrom mid-chain reclaims nothing — a
      // naive delete-below would orphan the head's own chain
      assert(IvfIndexStore.prune(spark, dir, keepFrom = 2L) === Seq.empty)
      assert(IvfIndexStore.latestVersion(spark, dir) === Some(2L))
      // compaction folds the chain into a full v=3; pruning below it
      // then reclaims the whole old chain
      assert(IvfIndexStore.compact(spark, dir) === 3L)
      assert(IvfIndexStore.compact(spark, dir) === 3L) // full head: no-op
      assert(IvfIndexStore.prune(spark, dir, keepFrom = 3L) === Seq(0L, 1L, 2L))
      assert(IvfIndexStore.latestVersion(spark, dir) === Some(3L))
      assert(IvfIndexStore.read(spark, dir).cells.count() === 62L)
      val head = intercept[IllegalArgumentException] {
        IvfIndexStore.prune(spark, dir, keepFrom = 5L)
      }
      assert(head.getMessage.contains("refusing to prune the head"))
    }
  }

  test("a re-dimensioned batch fails append and probe by name instead of silently vanishing") {
    withDir { dir =>
      val corpus = vecs((0L until 60L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 4)
      // without the valve the assignment kernel would commit these
      // rows into the FIRST cell with null cosines everywhere — rows
      // no probe ever returns, with zero errors anywhere
      val wrong = Seq((501L, Array.fill(8)(0.1f))).toDF("vec_id", "embedding")
      val ea = intercept[IllegalArgumentException] {
        IvfIndexStore.append(spark, dir, wrong, "vec_id", "embedding", 0L)
      }
      assert(ea.getMessage.contains("dimension 8..8") &&
        ea.getMessage.contains("dim=16"), s"wrong error: ${ea.getMessage}")
      assert(IvfIndexStore.latestVersion(spark, dir) === Some(0L),
        "the refused append must commit nothing")
      val ep = intercept[IllegalArgumentException] {
        IvfIndexStore.probeLatest(spark, dir, wrong, "vec_id", "embedding",
          k = 3)
      }
      assert(ep.getMessage.contains("dim=16"))
      // null vectors are NOT a dim violation: they score null cosine
      // and are threshold-filtered, so the valve must admit them
      val withNull = Seq((502L, base(700)),
        (503L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
      assert(IvfIndexStore.append(spark, dir, withNull,
        "vec_id", "embedding", 0L) === 1L)
      // an EMPTY batch append is a no-op, not a chain link: an empty
      // cell-partitioned write would commit a FILE-LESS frame that
      // poisons every later chain read at schema inference
      assert(IvfIndexStore.append(spark, dir, corpus.where(lit(false)),
        "vec_id", "embedding", 1L) === 1L)
      assert(IvfIndexStore.latestVersion(spark, dir) === Some(1L))
      assert(IvfIndexStore.read(spark, dir).cells.count() > 0)
    }
  }

  test("drift report: in-distribution batch stays quiet, shifted batch fires") {
    withDir { dir =>
      // the SemanticIndexStoreSpec drift geometry: tight clusters train
      // a small-distance profile, full-space directions blow past it
      def member(cluster: Int, i: Int): Array[Float] = {
        val c = base(cluster * 1000)
        val rnd = new scala.util.Random(cluster * 1000 + i)
        c.map(x => x + 0.02f * (rnd.nextFloat() - 0.5f))
      }
      val corpus = vecs((for { k <- 0 until 4; i <- 0 until 50 }
        yield ((k * 50 + i).toLong, member(k, 500 + i))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val inDist = IvfIndexStore.driftReport(spark, dir,
        vecs((0 until 40).map(i => ((900 + i).toLong, member(i % 4, 9000 + i))): _*),
        "embedding")
      assert(inDist.scoredRows === 40L)
      assert(inDist.fracBeyondTrainP99 <= 0.2,
        s"in-distribution batch must stay quiet: $inDist")
      def randomDir(i: Int): Array[Float] = {
        val rnd = new scala.util.Random(777000 + i)
        Array.fill(16)(rnd.nextFloat() * 2 - 1)
      }
      val drifted = IvfIndexStore.driftReport(spark, dir,
        vecs((0 until 40).map(i => ((1900 + i).toLong, randomDir(i))): _*),
        "embedding")
      assert(drifted.fracBeyondTrainP99 >= 0.6,
        s"shifted batch must fire: $drifted")
      assert(drifted.batchP50 > drifted.trainP99)
      // a mis-dimensioned batch fails by name, like append and probe
      val e = intercept[IllegalArgumentException] {
        IvfIndexStore.driftReport(spark, dir,
          vecs((1L, Array.fill(8)(0.5f))), "embedding")
      }
      assert(e.getMessage.contains("drift report"))
    }
  }

  test("delta appends: O(batch) writes, chain reads, compaction equivalence") {
    withDir { dir =>
      val corpus = vecs((0L until 100L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      IvfIndexStore.append(spark, dir, vecs((501L, base(900))),
        "vec_id", "embedding", 0L)
      IvfIndexStore.append(spark, dir,
        vecs((502L, base(901)), (503L, base(902))), "vec_id", "embedding", 1L)
      // the append versions hold ONLY their batch rows on disk — the
      // O(batch) maintenance claim, read straight off the layout
      def diskRows(v: Long) =
        spark.read.parquet(s"$dir/v=$v/cells").count()
      assert(diskRows(0) === 100L)
      assert(diskRows(1) === 1L)
      assert(diskRows(2) === 2L)
      // a read unions the chain
      val v2 = IvfIndexStore.read(spark, dir)
      assert(!v2.meta.full && v2.cells.count() === 103L)
      // probes see the whole merged corpus through the chain
      def top1(df: org.apache.spark.sql.DataFrame): Long =
        df.orderBy("rank").limit(1).collect()(0).getLong(1)
      val probeBefore = IvfIndexStore.probeLatest(spark, dir,
        vecs((998L, base(901))), "vec_id", "embedding", k = 3, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(top1(IvfIndexStore.probeLatest(spark, dir,
        vecs((998L, base(901))), "vec_id", "embedding", k = 3, nprobe = 8)) === 502L)
      // compaction changes the layout, never the answer
      val full = IvfIndexStore.compact(spark, dir)
      assert(IvfIndexStore.read(spark, dir, Some(full)).meta.full)
      assert(diskRows(full) === 103L)
      val probeAfter = IvfIndexStore.probeLatest(spark, dir,
        vecs((998L, base(901))), "vec_id", "embedding", k = 3, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(probeAfter === probeBefore)
      // a cut chain fails by name instead of answering from a partial
      // corpus: delete the v=0 base behind the protocol's back and pin
      // the delta version (the compacted head no longer needs it)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(s"$dir/v=0")).deleteRecursively()
      val cut = intercept[IllegalArgumentException] {
        IvfIndexStore.read(spark, dir, Some(2L))
      }
      assert(cut.getMessage.contains("chain"))
      // the compacted head still serves
      assert(top1(IvfIndexStore.probeLatest(spark, dir,
        vecs((998L, base(901))), "vec_id", "embedding", k = 3, nprobe = 8)) === 502L)
    }
  }

  test("tombstone removal: removed rows leave probe and read; compact materializes the filtered frame and clears") {
    withDir { dir =>
      val corpus = vecs((0L until 100L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      IvfIndexStore.append(spark, dir,
        vecs((501L, base(900)), (502L, base(901))), "vec_id", "embedding", 0L)
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      // remove one doc from EACH chain link — O(tombstones), no corpus
      // touch (the remove version's cells payload is empty on disk)
      assert(IvfIndexStore.remove(spark, dir,
        Seq(5L, 501L).toDF("vec_id"), "vec_id", 1L) === 2L)
      assert(spark.read.parquet(s"$dir/v=2/cells").count() === 0L)
      assert(IvfIndexStore.liveTombs(spark, dir).collect()
        .map(_.getLong(0)).toSet === Set(5L, 501L))
      // read() excludes the tombstoned rows exactly
      val loaded = IvfIndexStore.read(spark, dir)
      val loadedIds = loaded.cells.select("corpus_id").collect()
        .map(_.getLong(0)).toSet
      assert(loadedIds === ((0L until 100L).toSet - 5L + 502L))
      // probe parity: probeLatest equals ivfProbe over the unfiltered
      // chain minus the removed ids — a removed doc can neither score
      // nor occupy a top-k slot, and its slot goes to the next best
      val raw = graft.ops.VersionedState
        .readCellChain(spark, dir, Seq(2L, 1L, 0L), None)
      val q = vecs((999L, base(5)), (998L, base(900)))
      val expected = rows(Similarity.ivfProbe(loaded.centroids,
        raw.where(!col("corpus_id").isin(5L, 501L)), q,
        "vec_id", "embedding", k = 3, nprobe = 8))
      val got = rows(IvfIndexStore.probeLatest(spark, dir, q,
        "vec_id", "embedding", k = 3, nprobe = 8))
      assert(got === expected)
      assert(!got.exists(r => r._2 == 5L || r._2 == 501L))
      // pinned BELOW the remove link: versioned time travel still
      // retrieves the removed doc
      def top1(df: DataFrame): Long =
        df.orderBy("rank").limit(1).collect()(0).getLong(1)
      assert(top1(IvfIndexStore.probeLatest(spark, dir, vecs((999L, base(5))),
        "vec_id", "embedding", k = 3, nprobe = 8, version = Some(1L))) === 5L)
      // compact materializes corpus-minus-removed as the new full
      // version and clears the debt
      assert(IvfIndexStore.compact(spark, dir) === 3L)
      assert(IvfIndexStore.liveTombs(spark, dir).isEmpty)
      assert(!new java.io.File(s"$dir/v=3/tombs").exists)
      val diskIds = spark.read.parquet(s"$dir/v=3/cells")
        .select("corpus_id").collect().map(_.getLong(0)).toSet
      assert(diskIds === loadedIds)
      assert(rows(IvfIndexStore.probeLatest(spark, dir, q,
        "vec_id", "embedding", k = 3, nprobe = 8)) === expected)
      // protocol: empty removal no-ops; a replayed remove refuses stale
      assert(IvfIndexStore.remove(spark, dir,
        Seq.empty[Long].toDF("vec_id"), "vec_id", 3L) === 3L)
      val stale = intercept[IllegalArgumentException] {
        IvfIndexStore.remove(spark, dir, Seq(7L).toDF("vec_id"), "vec_id", 1L)
      }
      assert(stale.getMessage.contains("another maintainer already advanced"))
    }
  }

  test("removing the entire corpus fails the compact by name — never a committed empty index") {
    withDir { dir =>
      val corpus = vecs((0L until 20L).map(i => (i, base(i.toInt))): _*)
      IvfIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 4)
      IvfIndexStore.remove(spark, dir,
        corpus.select("vec_id"), "vec_id", 0L)
      val e = intercept[Exception] { IvfIndexStore.compact(spark, dir) }
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(msgs(e).exists(_.contains("EMPTY index")), s"wrong error: $e")
      // nothing committed: the head is still the remove link, probes
      // still run (and find nothing — every row is tombstoned)
      assert(IvfIndexStore.latestVersion(spark, dir) === Some(1L))
      assert(IvfIndexStore.probeLatest(spark, dir, vecs((999L, base(3))),
        "vec_id", "embedding", k = 3, nprobe = 4).count() === 0L)
    }
  }
}
