package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.{Dedup, LinkageStore}
import graft.streaming.LinkageIngestStream

/** Ingest-stream fixture row (top-level: MemoryStream needs a TypeTag-
  * visible case class). */
case class LinkRow(blk: String, name: String)

/** Protocol + semantics specs for
  * [[graft.streaming.LinkageIngestStream]] — the linkage store's
  * maintainer loop: the end-to-end MemoryStream path answers exactly
  * the batch resolution over everything ingested, crash replay follows
  * the family's ledger rules (with the store's content-idempotence on
  * top), the cadence compacts, and foreign/uninitialized stores refuse
  * by name. */
class LinkageIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("blk", "name")

  private val standing = df(
    ("b1", "carl"), ("b1", "karl"), ("b1", "karim"), ("b1", "karin"),
    ("b1", "unique-xyz"))

  private def batchLabels(corpus: DataFrame): Set[(String, String, String)] =
    Dedup.resolveEntities(corpus, "name", Seq("blk"), maxDist = 1)
      .select("blk", "name", "canonical_name").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  private def storeLabels(dir: String): Set[(String, String, String)] =
    LinkageStore.labels(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  private def process(batch: DataFrame, batchId: Long, root: String,
                      compactEvery: Int = 8,
                      checkpoint: String = "cp-a"): LinkageIngestStream.BatchOutcome =
    LinkageIngestStream.processBatch(batch, batchId, s"$root/store",
      compactEvery, s"$root/$checkpoint")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("linkage-ingest").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("streaming linkage answers the batch resolution across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    withDir { root =>
      LinkageStore.init(standing, s"$root/store", "name", Seq("blk"),
        maxDist = 1)
      val input = MemoryStream[LinkRow]
      val q = LinkageIngestStream.linkageIngestSink(input.toDF(),
        s"$root/store", checkpointDir = s"$root/ckpt")
      try {
        // batch 0: a bridge merging both standing groups
        input.addData(LinkRow("b1", "kari"))
        q.processAllAvailable()
        assert(storeLabels(s"$root/store")
          === batchLabels(standing.unionByName(df(("b1", "kari")))))
        // batch 1: a new group whose min arrives second
        input.addData(LinkRow("b1", "zeta1"), LinkRow("b1", "zeta0"))
        q.processAllAvailable()
        assert(storeLabels(s"$root/store") === batchLabels(
          standing.unionByName(df(("b1", "kari"), ("b1", "zeta1"),
            ("b1", "zeta0")))))
      } finally q.stop()
    }
  }

  test("crash replay: committed append skips, lost append redoes, labels stable") {
    withDir { root =>
      LinkageStore.init(standing, s"$root/store", "name", Seq("blk"),
        maxDist = 1)
      val b0 = df(("b1", "kari"))
      val o1 = process(b0, 0L, root)
      assert(o1 === LinkageIngestStream.BatchOutcome(0L, 0L, 1L,
        replay = false, appendSkipped = false, compactedTo = None))
      val after0 = storeLabels(s"$root/store")
      // replay after the append committed: ledger head > base — skipped
      val o2 = process(b0, 0L, root)
      assert(o2.replay && o2.appendSkipped && o2.version === 1L)
      assert(storeLabels(s"$root/store") === after0)
      // crash BEFORE the append committed: ledger holds head == base —
      // the append redoes (and is a content no-op for replayed values)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/store/_ingest_ledger/b=1"),
        "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val o3 = process(df(("b1", "zeta1")), 1L, root)
      assert(o3.replay && !o3.appendSkipped && o3.version === 2L)
      // replay-dead ledger entries below the current batch are swept
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/store/_ingest_ledger/b=0")))
      // a batch with no new values leaves the chain alone
      val o4 = process(b0, 2L, root)
      assert(o4.version === 2L && !o4.replay)
      assert(storeLabels(s"$root/store") === batchLabels(
        standing.unionByName(df(("b1", "kari"), ("b1", "zeta1")))))
    }
  }

  test("guarded takedown: refuses a pending-replay checkpoint, then removes at head") {
    withDir { root =>
      LinkageStore.init(standing, s"$root/store", "name", Seq("blk"),
        maxDist = 1)
      val cp = s"$root/cp-a"
      process(df(("b1", "kari")), 0L, root)
      // checkpoint mid-crash: offsets for batch 1 written, no commit —
      // batch 1 WILL replay on resume, and a head advance now would
      // make it read its own (lost) append as committed and skip it
      def mark(sub: String, ids: Seq[Int]): Unit = {
        val d = new java.io.File(cp, sub); d.mkdirs()
        ids.foreach(i => java.nio.file.Files.write(
          d.toPath.resolve(i.toString), "v1".getBytes))
      }
      mark("offsets", Seq(0, 1)); mark("commits", Seq(0))
      val msg = intercept[IllegalStateException](
        LinkageIngestStream.removeValues(spark, s"$root/store", cp,
          df(("b1", "kari")))).getMessage
      assert(msg.contains("pending replay") && msg.contains("batch 1"), msg)
      assert(storeLabels(s"$root/store") === batchLabels(
        standing.unionByName(df(("b1", "kari")))),
        "a refused takedown must leave the store untouched")
      // the stream drains the batch → the takedown proceeds at head,
      // and the store answers the batch resolution over the survivors
      val o1 = process(df(("b1", "zeta1")), 1L, root)
      mark("commits", Seq(1))
      val v = LinkageIngestStream.removeValues(spark, s"$root/store", cp,
        df(("b1", "kari")))
      assert(v === o1.version + 1)
      assert(storeLabels(s"$root/store") === batchLabels(
        standing.unionByName(df(("b1", "zeta1")))))
    }
  }

  test("cadence compacts the chain; foreign checkpoints and uninit stores refuse") {
    withDir { root =>
      LinkageStore.init(standing, s"$root/store", "name", Seq("blk"),
        maxDist = 1)
      // three appends at compactEvery=2: batch 1 pushes the chain to 3
      // links (v0+v1+v2) and trips the fold; batch 2 appends onto the
      // fresh full version
      val o1 = process(df(("b1", "kari")), 0L, root, compactEvery = 2)
      val o2 = process(df(("b1", "zeta1")), 1L, root, compactEvery = 2)
      val o3 = process(df(("b1", "zeta0")), 2L, root, compactEvery = 2)
      assert(o1.compactedTo.isEmpty)
      assert(o2.compactedTo === Some(3L))
      assert(o3.compactedTo.isEmpty && o3.version === 4L)
      assert(LinkageStore.chainLength(spark, s"$root/store") === 2)
      assert(storeLabels(s"$root/store") === batchLabels(
        standing.unionByName(df(("b1", "kari"), ("b1", "zeta1"),
          ("b1", "zeta0")))))
      // another checkpoint against the same store: the owner stamp names it
      val msg = intercept[IllegalArgumentException](
        process(df(("b1", "new1")), 0L, root, checkpoint = "cp-b"))
        .getMessage
      assert(msg.contains("cp-a"), msg)
      // an uninitialized store refuses before any ledger write
      val msg2 = intercept[IllegalStateException](
        LinkageIngestStream.processBatch(df(("b1", "x")), 0L,
          s"$root/empty-store", 8, s"$root/cp-c")).getMessage
      assert(msg2.contains("no committed version"), msg2)
    }
  }
}
