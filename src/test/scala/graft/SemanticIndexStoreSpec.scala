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
      assert(v0.meta === SemanticIndexStore.SemMeta(16, 8))
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
      // and the identical-vector merge collapsed 7/303 into one group
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
      // prune: drop v=0, keep the head; a pruned pin then fails by name
      // and pruning the head itself refuses
      SemanticIndexStore.append(spark, dir, vecs((203L, base(502))),
        "vec_id", "embedding", 1L)
      assert(SemanticIndexStore.prune(spark, dir, keepFrom = 2L) === Seq(0L, 1L))
      assert(SemanticIndexStore.latestVersion(spark, dir) === Some(2L))
      val pruned = intercept[IllegalArgumentException] {
        SemanticIndexStore.read(spark, dir, Some(0L))
      }
      assert(pruned.getMessage.contains("no committed version v=0"))
      val head = intercept[IllegalArgumentException] {
        SemanticIndexStore.prune(spark, dir, keepFrom = 5L)
      }
      assert(head.getMessage.contains("refusing to prune the head"))
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

  test("probe I/O: cell-partitioned layout; the standing scan partition-prunes to the batch's cells") {
    withDir { dir =>
      val corpus = vecs((0L until 80L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, dir, "vec_id", "embedding", nlist = 8)
      val cellDirs = new java.io.File(s"$dir/v=0/cells").listFiles()
        .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
      assert(cellDirs.nonEmpty, "cells frame is not cell-partitioned on disk")
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
      cellScans.foreach { s =>
        assert(s.partitionFilters.nonEmpty && s.partitionFilters.mkString.contains("cell"),
          s"standing cells scan is not partition-pruned:\n$s")
      }
    }
  }
}
