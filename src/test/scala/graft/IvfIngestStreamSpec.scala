package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.IvfIndexStore
import graft.streaming.IvfIngestStream

/** Specs for [[graft.streaming.IvfIngestStream]] — the append-only
  * maintainer: appended vectors become probe-visible, replay through
  * the shared ledger (committed append skipped, lost append redone),
  * the drift gate (quiet in-distribution, hard fail-by-name past the
  * train p99), the cadence compact + prune, and the
  * uninitialized-store refusal. Reuses [[IngestVec]] as the stream
  * row. */
class IvfIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }
  private def vecs(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def process(batch: DataFrame, batchId: Long, dir: String,
                      compactEvery: Int = 9): IvfIngestStream.BatchOutcome =
    IvfIngestStream.processBatch(batch, batchId, s"$dir/store",
      "vec_id", "embedding", compactEvery = compactEvery,
      checkpointDir = s"$dir/cp-a")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-ingest").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("streamed appends become probe-visible; the maintained index ranks them first") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      IvfIndexStore.init(vecs((0L until 100L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      val input = MemoryStream[IngestVec]
      val query = IvfIngestStream.ivfIngestSink(input.toDF(), s"$dir/store",
        "vec_id", "embedding", checkpointDir = s"$dir/ckpt")
      try {
        input.addData((0 until 10).map(i =>
          IngestVec((200 + i).toLong, base(200 + i))): _*)
        query.processAllAvailable()
        input.addData((0 until 10).map(i =>
          IngestVec((300 + i).toLong, base(300 + i))): _*)
        query.processAllAvailable()
      } finally query.stop()
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      // an exact copy of a vector appended in EACH batch must rank
      // first for its query at score 1.0 — the appends are live
      val top = IvfIndexStore.probeLatest(spark, s"$dir/store",
        vecs((901L, base(205)), (902L, base(307))), "vec_id", "embedding",
        k = 1)
        .select("query_id", "corpus_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(top === Set((901L, 205L, 1), (902L, 307L, 1)))
    }
  }

  test("crash replay: committed append skipped, lost append redone; empty batch no-ops") {
    withDir { dir =>
      IvfIndexStore.init(vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      val b0 = vecs((0 until 10).map(i => ((100 + i).toLong, base(400 + i))): _*)
      val o1 = process(b0, 0L, dir)
      assert((o1.base, o1.version, o1.appended, o1.replay) === ((0L, 1L, 10L, false)))
      val o2 = process(b0, 0L, dir)
      assert(o2.replay && o2.appendSkipped && o2.version === 1L)
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(1L))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/store/_ingest_ledger/b=1"),
        "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val o3 = process(vecs((0 until 10).map(i =>
        ((200 + i).toLong, base(500 + i))): _*), 1L, dir)
      assert(o3.replay && !o3.appendSkipped && o3.version === 2L)
      val o4 = process(vecs(), 2L, dir)
      assert(o4.appended === 0L && o4.version === 2L && o4.drift === None)
    }
  }

  test("stream-level crash replay: the restarted query skips its committed append") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      IvfIndexStore.init(vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      val input = MemoryStream[IngestVec]
      def run() = IvfIngestStream.ivfIngestSink(input.toDF(), s"$dir/store",
        "vec_id", "embedding", checkpointDir = s"$dir/ckpt")
      val q1 = run()
      try {
        input.addData((0 until 10).map(i =>
          IngestVec((100 + i).toLong, base(700 + i))): _*)
        q1.processAllAvailable()
        input.addData((0 until 10).map(i =>
          IngestVec((200 + i).toLong, base(800 + i))): _*)
        q1.processAllAvailable()
      } finally q1.stop()
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/.1.crc"))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      // a double-append would advance the version to 3 and duplicate ids
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
    }
  }

  test("drift gate: quiet for cluster members, fails by name for a shifted batch") {
    withDir { dir =>
      def member(cluster: Int, i: Int): Array[Float] = {
        val c = base(cluster * 1000)
        val rnd = new scala.util.Random(cluster * 1000 + i)
        c.map(x => x + 0.02f * (rnd.nextFloat() - 0.5f))
      }
      IvfIndexStore.init(vecs((for { k <- 0 until 4; i <- 0 until 50 }
        yield ((k * 50 + i).toLong, member(k, 500 + i))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      val o0 = process(vecs((0 until 40).map(i =>
        ((900 + i).toLong, member(i % 4, 9000 + i))): _*), 0L, dir)
      assert(o0.drift.isDefined && o0.drift.get.fracBeyondTrainP99 <= 0.2)
      assert(o0.version === 1L && o0.appended === 40L)
      def randomDir(i: Int): Array[Float] = {
        val rnd = new scala.util.Random(777000 + i)
        Array.fill(16)(rnd.nextFloat() * 2 - 1)
      }
      val ex = intercept[IllegalStateException] {
        process(vecs((0 until 20).map(i =>
          ((1900 + i).toLong, randomDir(i))): _*), 1L, dir)
      }
      assert(ex.getMessage.contains("beyond the train-time p99"))
      assert(ex.getMessage.contains("recall"))
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(1L))
    }
  }

  test("cadence: chain length past compactEvery triggers compact + prune") {
    withDir { dir =>
      IvfIndexStore.init(vecs((0L until 50L).map(i => (i, base(i.toInt))): _*),
        s"$dir/store", "vec_id", "embedding", nlist = 8)
      // median-anchoring copies of corpus vectors (new ids) keep the
      // drift gate deterministically quiet around the fresh vector
      val o0 = process(vecs((901L, base(10)), (902L, base(11)),
        (101L, base(601))), 0L, dir, compactEvery = 2)
      assert(o0.version === 1L && o0.compactedTo === None)
      assert(IvfIndexStore.chainLength(spark, s"$dir/store") === 2)
      val o1 = process(vecs((903L, base(12)), (904L, base(13)),
        (102L, base(602))), 1L, dir, compactEvery = 2)
      assert(o1.version === 2L && o1.compactedTo === Some(3L))
      assert(IvfIndexStore.latestVersion(spark, s"$dir/store") === Some(3L))
      assert(IvfIndexStore.chainLength(spark, s"$dir/store") === 1)
      intercept[IllegalArgumentException] {
        IvfIndexStore.read(spark, s"$dir/store", Some(0L))
      }
      // post-compaction, every appended vector still answers
      val top = IvfIndexStore.probeLatest(spark, s"$dir/store",
        vecs((991L, base(601)), (992L, base(602))), "vec_id", "embedding",
        k = 1)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(top === Set((991L, 101L), (992L, 102L)))
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
