package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.SemanticIndexStore
import graft.streaming.SemanticIngestStream

/** Ingest-stream fixture row (top-level: MemoryStream needs a TypeTag-
  * visible case class). */
case class IngestVec(vec_id: Long, embedding: Array[Float])

/** Protocol + semantics specs for
  * [[graft.streaming.SemanticIngestStream]]: the end-to-end micro-batch
  * loop over the SemDeDup store, the per-batch drift gate (quiet
  * in-distribution, hard fail-by-name past the train p99), replay
  * stability of the re-probe (pairs arrive through extra routes after
  * a committed append — the exists-semantics survivor rule must not
  * care), the cadence compact, and the uninitialized-store refusal.
  * The ledger/owner machinery itself is [[graft.streaming
  * .IngestProtocol]], spec-pinned in `DedupIngestStreamSpec`. */
class SemanticIngestStreamSpec extends SparkSpec {
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

  private def process(batch: DataFrame, batchId: Long, dir: String,
                      compactEvery: Int = 9): SemanticIngestStream.BatchOutcome =
    SemanticIngestStream.processBatch(batch, batchId, s"$dir/store",
      s"$dir/accepted", "vec_id", "embedding", threshold = 0.9,
      compactEvery = compactEvery, checkpointDir = s"$dir/cp-a")

  // the corpus read surface once cadence folding exists (pre-fold it
  // equals a raw parquet read of the directory)
  private def acceptedIds(acceptedDir: String): Set[Long] =
    graft.streaming.AcceptedSink.readAccepted(spark, acceptedDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("sem-ingest").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("streaming semantic ingest dedups against corpus, batch, and earlier survivors") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      val corpus = vecs((0L until 100L).map(i => (i, base(i.toInt))): _*)
      SemanticIndexStore.init(corpus, s"$dir/store", "vec_id", "embedding",
        nlist = 8)
      val input = MemoryStream[IngestVec]
      val query = SemanticIngestStream.semanticIngestSink(input.toDF(),
        s"$dir/store", s"$dir/accepted", "vec_id", "embedding",
        checkpointDir = s"$dir/ckpt", threshold = 0.9)
      try {
        // batch 0: a near-dup of corpus member 3 rejects; a fresh vector
        // accepts; an identical within-batch pair keeps the smaller id
        input.addData(IngestVec(201L, jitter(base(3))),
          IngestVec(202L, base(500)),
          IngestVec(203L, base(600)), IngestVec(204L, base(600)))
        query.processAllAvailable()
        assert(acceptedIds(s"$dir/accepted") === Set(202L, 203L))
        // batch 1: a near-dup of batch 0's SURVIVOR 202 rejects (the
        // append took effect); a fresh vector accepts
        input.addData(IngestVec(301L, jitter(base(500))),
          IngestVec(302L, base(700)))
        query.processAllAvailable()
        assert(acceptedIds(s"$dir/accepted") === Set(202L, 203L, 302L))
      } finally query.stop()
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      // the maintained store probes the whole accepted history
      val pairs = SemanticIndexStore.probeLatest(spark, s"$dir/store",
        vecs((999L, jitter(base(700)))), "vec_id", "embedding",
        threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((302L, 999L)))
    }
  }

  test("drift gate: in-distribution batches ride with the report; a drifted batch fails by name before any write") {
    withDir { dir =>
      // tight clusters → small train quantiles → a meaningful p99 ceiling
      def member(cluster: Int, i: Int): Array[Float] = {
        val c = base(cluster * 1000)
        val rnd = new scala.util.Random(cluster * 1000 + i)
        c.map(x => x + 0.02f * (rnd.nextFloat() - 0.5f))
      }
      val corpus = vecs((for { k <- 0 until 4; i <- 0 until 50 }
        yield ((k * 50 + i).toLong, member(k, 500 + i))): _*)
      SemanticIndexStore.init(corpus, s"$dir/store", "vec_id", "embedding",
        nlist = 8)
      // same clusters: the gate stays quiet and the report rides the
      // outcome (these members are ALSO near-dups of the corpus at 0.9,
      // so they all reject and the append no-ops — this test is about
      // the gate, not the dedup)
      val o0 = process(vecs((0 until 40).map(i =>
        ((900 + i).toLong, member(i % 4, 9000 + i))): _*), 0L, dir)
      assert(o0.drift.isDefined && o0.drift.get.fracBeyondTrainP99 <= 0.2)
      assert(o0.version === 0L && o0.accepted === 0L)
      def randomDir(i: Int): Array[Float] = {
        val rnd = new scala.util.Random(777000 + i)
        Array.fill(16)(rnd.nextFloat() * 2 - 1)
      }
      // a TINY far-out batch (below the driftGateMinRows floor) rides
      // through with the advisory report only — a median over a handful
      // of draws is one outlier wide, and one legitimate stray vector
      // must not kill the stream
      val oSmall = process(vecs((0 until 3).map(i =>
        ((1500 + i).toLong, randomDir(100 + i))): _*), 1L, dir)
      assert(oSmall.drift.get.fracBeyondTrainP99 >= 0.6)
      assert(oSmall.version === 1L, "small batch must append, not gate")
      // full-space random vectors at gate mass: typical assign distance
      // beyond the train p99 — the hard trigger fires BEFORE
      // probe/write/append
      val ex = intercept[IllegalStateException] {
        process(vecs((0 until 20).map(i =>
          ((1900 + i).toLong, randomDir(i))): _*), 2L, dir)
      }
      assert(ex.getMessage.contains("beyond the train-time p99"))
      assert(ex.getMessage.contains("retrain"))
      // nothing moved: no append, no accepted output for batch 2
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(1L))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/accepted/batch=2")))
    }
  }

  test("crash replay: re-probe after a committed append resolves identically") {
    withDir { dir =>
      SemanticIndexStore.init(
        vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      // corpus dup + identical within-batch pair + fresh — on replay the
      // survivors' standing copies add crossOldNew routes for the same
      // pairs; the exists-semantics rule must land the same accepted set
      val b0 = vecs((101L, base(800)), (102L, jitter(base(1))),
        (103L, base(900)), (104L, base(900)))
      val o1 = process(b0, 0L, dir)
      assert((o1.base, o1.version, o1.accepted, o1.replay) === ((0L, 1L, 2L, false)))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 103L))
      val o2 = process(b0, 0L, dir)
      assert(o2.replay && o2.appendSkipped && o2.version === 1L)
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(1L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 103L))
      // crash-before-append replay: ledger entry standing, head == base —
      // the append must redo
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/store/_ingest_ledger/b=1"),
        "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val o3 = process(vecs((201L, base(850))), 1L, dir)
      assert(o3.replay && !o3.appendSkipped && o3.version === 2L)
      // an empty batch is a full no-op with nothing to profile
      val o4 = process(vecs(), 2L, dir)
      assert(o4.accepted === 0L && o4.version === 2L && o4.drift === None)
    }
  }

  test("stream-level crash replay: the restarted query skips its committed append") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      SemanticIndexStore.init(
        vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      val input = MemoryStream[IngestVec]
      def run() = SemanticIngestStream.semanticIngestSink(input.toDF(),
        s"$dir/store", s"$dir/accepted", "vec_id", "embedding",
        checkpointDir = s"$dir/ckpt", threshold = 0.9)
      val q1 = run()
      try {
        input.addData(IngestVec(101L, base(800)))
        q1.processAllAvailable()
        // 202 dups batch 0's survivor; 201 is fresh
        input.addData(IngestVec(201L, base(850)), IngestVec(202L, base(800)))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 201L))
      // crash between batch 1's effects and its checkpoint commit (the
      // CdcStream simulation pattern); the restarted sink replays batch
      // 1 and the ledger makes it skip the committed append
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/.1.crc"))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 201L))
    }
  }

  test("cadence: chain length past compactEvery triggers compact + prune; history survives") {
    withDir { dir =>
      // a spread corpus, so the train-time quantiles leave headroom for
      // the fresh random batch vectors below (a tight or single-vector
      // init would trip the drift gate by construction)
      SemanticIndexStore.init(
        vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      // each batch anchors its assign-distance MEDIAN with two exact
      // corpus copies (train-distribution distances), so the drift gate
      // stays deterministically quiet while the single fresh random
      // vector (whose own distance may straddle the train p99) is what
      // actually survives and grows the chain
      val o0 = process(vecs((901L, base(10)), (902L, base(11)),
        (101L, base(101))), 0L, dir, compactEvery = 2)
      assert(o0.version === 1L && o0.accepted === 1L && o0.compactedTo === None)
      assert(SemanticIndexStore.chainLength(spark, s"$dir/store") === 2)
      val o1 = process(vecs((903L, base(12)), (904L, base(13)),
        (102L, base(102))), 1L, dir, compactEvery = 2)
      assert(o1.version === 2L && o1.compactedTo === Some(3L))
      assert(SemanticIndexStore.latestVersion(spark, s"$dir/store") === Some(3L))
      assert(SemanticIndexStore.chainLength(spark, s"$dir/store") === 1)
      // the compacted store still dedups the whole accepted history
      val o2 = process(vecs((905L, base(14)), (906L, base(15)),
        (301L, base(101)), (302L, base(302))), 2L, dir, compactEvery = 2)
      assert(o2.version === 4L)
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 102L, 302L))
    }
  }

  test("an uninitialized store is refused by name") {
    withDir { dir =>
      val ex = intercept[IllegalStateException] {
        process(vecs((101L, base(101))), 0L, dir)
      }
      assert(ex.getMessage.contains("no committed index version"))
    }
  }
}
