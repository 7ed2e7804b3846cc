package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.MinhashIndexStore
import graft.streaming.DedupIngestStream

/** Ingest-stream fixture row (top-level: MemoryStream needs a TypeTag-
  * visible case class). */
case class IngestDoc(doc_id: Long, text: String)

/** Protocol + semantics specs for [[graft.streaming.DedupIngestStream]]:
  * the end-to-end micro-batch loop (probe → survivor rule → delta
  * append → cadence maintenance), the survivor rule's three branches,
  * crash-replay idempotence through the ledger (both the
  * append-committed and append-lost interleavings), the cadence
  * compact + prune, the valve-exceeded fail-by-name, and the
  * owner-stamp / uninitialized-store refusals. */
class DedupIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Texts with doc-unique tokens: two different `uniq` ids share ZERO
    * shingles by construction, so the only near-dup pairs in any
    * fixture are the ones planted as copies. */
  private def uniq(i: Long): String =
    (0 until 12).map(w => s"w${i}x$w").mkString(" ")

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def initStore(dir: String, corpus: DataFrame,
                        maxGroupSize: Int = graft.ops.Dedup.DefaultMaxGroupSize): Unit =
    MinhashIndexStore.init(corpus, dir, "doc_id", "text",
      shingleK = 5, numBands = 24, rowsPerBand = 2,
      maxGroupSize = maxGroupSize)

  // the corpus read surface once folding exists (pre-fold it equals a
  // raw parquet read of the directory — both paths are exercised below)
  private def acceptedIds(acceptedDir: String): Set[Long] =
    graft.streaming.AcceptedSink.readAccepted(spark, acceptedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def process(batch: DataFrame, batchId: Long, dir: String,
                      compactEvery: Int = 8,
                      checkpoint: String = "cp-a"): DedupIngestStream.BatchOutcome =
    DedupIngestStream.processBatch(batch, batchId, s"$dir/store",
      s"$dir/accepted", "doc_id", "text", threshold = 0.5,
      compactEvery = compactEvery, checkpointDir = s"$dir/$checkpoint")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("dedup-ingest").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("streaming ingest dedups against corpus, batch, and earlier batches' survivors") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      // corpus ids straddle the batch ids on BOTH sides: doc 500 > every
      // batch id, so the corpus-partner branch must win over id order
      val corpus = docsDf((1L to 6L).map(i => (i, uniq(i))) :+ (500L, uniq(500)): _*)
      initStore(s"$dir/store", corpus)
      val input = MemoryStream[IngestDoc]
      val query = DedupIngestStream.dedupIngestSink(input.toDF(),
        s"$dir/store", s"$dir/accepted", "doc_id", "text",
        checkpointDir = s"$dir/ckpt")
      try {
        // batch 0: two fresh docs; a copy of corpus doc 3 (smaller
        // corpus id); a copy of corpus doc 500 (LARGER corpus id — the
        // standing copy still wins); an identical within-batch pair
        // (keep-first: 107 survives, 108 loses)
        input.addData(IngestDoc(101L, uniq(101)), IngestDoc(102L, uniq(102)),
          IngestDoc(106L, uniq(3)), IngestDoc(99L, uniq(500)),
          IngestDoc(107L, uniq(777)), IngestDoc(108L, uniq(777)))
        query.processAllAvailable()
        assert(acceptedIds(s"$dir/accepted") === Set(101L, 102L, 107L))
        // the accepted sink's file count is bounded by row mass, not
        // inherited from the source partitioning
        assert(new java.io.File(s"$dir/accepted/batch=0").listFiles()
          .count(_.getName.endsWith(".parquet")) === 1)
        // batch 1: a copy of batch 0's SURVIVOR 107 rejects (the append
        // took effect); a fresh doc is accepted
        input.addData(IngestDoc(201L, uniq(777)), IngestDoc(203L, uniq(203)))
        query.processAllAvailable()
        assert(acceptedIds(s"$dir/accepted") === Set(101L, 102L, 107L, 203L))
        // partition-style layout: the batch column says who came when
        val byBatch = spark.read.parquet(s"$dir/accepted")
          .select("doc_id", "batch").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(byBatch === Map(101L -> 0, 102L -> 0, 107L -> 0, 203L -> 1))
      } finally query.stop()
      // the store advanced one delta per non-empty batch and probes the
      // whole accepted corpus: a resend of batch 1's survivor pairs at 1.0
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      val pairs = MinhashIndexStore.probeLatest(spark, s"$dir/store",
        docsDf((999L, uniq(203))), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSet === Set((203L, 999L, 1.0)))
    }
  }

  test("crash replay: committed append is skipped, lost append is redone, output is stable") {
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L to 5L).map(i => (i, uniq(i))): _*))
      // a corpus dup AND a within-batch pair in the replayed batch — the
      // replay probe runs against an index that now CONTAINS survivor
      // 103, and must still resolve both the same way
      val b0 = docsDf((101L, uniq(101)), (102L, uniq(1)),
        (103L, uniq(888)), (104L, uniq(888)))
      val o1 = process(b0, 0L, dir)
      assert(o1 === DedupIngestStream.BatchOutcome(0L, 0L, 1L, 2L,
        replay = false, appendSkipped = false, compactedTo = None))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 103L))
      // replay after everything committed but the checkpoint: the ledger
      // sees head > base, skips the append, rewrites the same output
      val o2 = process(b0, 0L, dir)
      assert(o2.replay && o2.appendSkipped && o2.version === 1L)
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(1L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 103L))
      // replay where the crash hit BEFORE the append committed: the
      // ledger entry exists, head == base, so the append must redo
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/store/_ingest_ledger/b=1"),
        "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val o3 = process(docsDf((201L, uniq(201))), 1L, dir)
      assert(o3.replay && !o3.appendSkipped && o3.version === 2L)
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 103L, 201L))
      // replay-dead ledger entries below the current batch are swept
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/store/_ingest_ledger/b=0")))
      // an empty batch is a full no-op on the index
      val o4 = process(docsDf(), 2L, dir)
      assert(o4.accepted === 0L && o4.version === 2L)
    }
  }

  test("stream-level crash replay: the restarted query skips its committed append") {
    implicit val sqlCtx = spark.sqlContext
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L to 5L).map(i => (i, uniq(i))): _*))
      val input = MemoryStream[IngestDoc]
      def run() = DedupIngestStream.dedupIngestSink(input.toDF(),
        s"$dir/store", s"$dir/accepted", "doc_id", "text",
        checkpointDir = s"$dir/ckpt")
      val q1 = run()
      try {
        input.addData(IngestDoc(101L, uniq(101)))
        q1.processAllAvailable()
        // 202 dups batch 0's survivor; 201 is fresh
        input.addData(IngestDoc(201L, uniq(201)), IngestDoc(202L, uniq(101)))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 201L))
      // crash between batch 1's effects and its checkpoint commit: on
      // restart, foreachBatch replays batchId 1 with the same data (the
      // CdcStream crash-simulation pattern, incl. the ChecksumFileSystem
      // .crc sibling)
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/ckpt/commits/.1.crc"))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      // the ledger told the replay its append committed: no double
      // append (201 would otherwise enter the index twice), no version
      // growth, same accepted output
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 201L))
    }
  }

  test("cadence: chain length past compactEvery triggers compact + prune") {
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      val o0 = process(docsDf((101L, uniq(101))), 0L, dir, compactEvery = 2)
      assert(o0.version === 1L && o0.compactedTo === None)
      assert(MinhashIndexStore.chainLength(spark, s"$dir/store") === 2)
      // third link trips the cadence: compact folds to a full v=3 and
      // prune reclaims everything below it
      val o1 = process(docsDf((102L, uniq(102))), 1L, dir, compactEvery = 2)
      assert(o1.version === 2L && o1.compactedTo === Some(3L))
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(3L))
      assert(MinhashIndexStore.chainLength(spark, s"$dir/store") === 1)
      intercept[IllegalArgumentException] {
        MinhashIndexStore.read(spark, s"$dir/store", Some(0L))
      }
      // the same trip folded the replay-dead accepted batch dirs (below
      // the current batch) into the archive; the read surface is intact
      assert(o1.acceptedFoldedTo === Some(0L))
      assert(!new java.io.File(s"$dir/accepted/batch=0").exists,
        "folded batch directories must be deleted")
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 102L))
      // the compacted store still dedups the whole history
      val o2 = process(docsDf((301L, uniq(101)), (302L, uniq(302))), 2L, dir,
        compactEvery = 2)
      assert(o2.version === 4L)
      assert(acceptedIds(s"$dir/accepted") === Set(101L, 102L, 302L))
    }
  }

  test("accepted-sink lifecycle: folds bound the directory count, data and batch lineage intact, crash- and replay-safe") {
    import graft.streaming.AcceptedSink
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      // six batches at compactEvery=2: every trip folds the replay-dead
      // directories below the current batch
      (0L to 5L).foreach { b =>
        process(docsDf((100L + b, uniq(100 + b))), b, dir, compactEvery = 2)
      }
      val liveDirs = new java.io.File(s"$dir/accepted").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(liveDirs.size <= 2,
        s"directory count must track cadence trips, not batches: $liveDirs")
      // every accepted doc is present with its ORIGINAL batch lineage,
      // whichever tier it sits in
      val byBatch = AcceptedSink.readAccepted(spark, s"$dir/accepted")
        .select("doc_id", "batch").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byBatch === (0L to 5L).map(b => (100L + b) -> b).toMap)
      // replaying the last batch rewrites only its own (still-live)
      // directory — the corpus is unchanged
      val replay = process(docsDf((105L, uniq(105))), 5L, dir, compactEvery = 2)
      assert(replay.replay)
      assert(AcceptedSink.readAccepted(spark, s"$dir/accepted")
        .count() === 6L)
      // crash window: a fold that committed its archive version but
      // died before deleting the folded directories leaves at-or-below-
      // watermark debris — readers exclude it on sight, the next fold
      // deletes it, and no row duplicates
      assert(AcceptedSink.maxFoldedBatch(spark, s"$dir/accepted") === Some(4L))
      docsDf((100L, uniq(100))).write
        .parquet(s"$dir/accepted/batch=0") // resurrect a folded dir
      assert(AcceptedSink.readAccepted(spark, s"$dir/accepted")
        .count() === 6L, "a below-watermark debris dir must not duplicate rows")
      // the explicit fold clears the debris on sight AND folds the last
      // live directory (batch 5 is below belowBatch=7)
      assert(AcceptedSink.fold(spark, s"$dir/accepted", belowBatch = 7L)
        === Some(5L))
      assert(!new java.io.File(s"$dir/accepted/batch=0").exists,
        "the next fold must clear crash debris on sight")
      assert(!new java.io.File(s"$dir/accepted/batch=5").exists)
      // the deeper pass: compactArchive folds the delta chain into one
      // full version; prune reclaims the folded links; data intact
      val full = AcceptedSink.compactArchive(spark, s"$dir/accepted").get
      assert(AcceptedSink.prune(spark, s"$dir/accepted", full).nonEmpty)
      assert(AcceptedSink.readAccepted(spark, s"$dir/accepted")
        .select("doc_id", "batch").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap === byBatch)
      assert(AcceptedSink.maxFoldedBatch(spark, s"$dir/accepted")
        === Some(5L))
    }
  }

  test("accepted-sink takedown: tombstones suppress both tiers immediately; bytes leave and debt clears at the right compacts") {
    import graft.streaming.AcceptedSink
    withDir { dir =>
      val acc = s"$dir/accepted"
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      // four batches at compactEvery=2: folds at b1 (watermark 0) and
      // b3 (watermark 2); batch=3 stays live
      (0L to 3L).foreach { b =>
        process(docsDf((100L + b, uniq(100 + b))), b, dir, compactEvery = 2)
      }
      assert(AcceptedSink.maxFoldedBatch(spark, acc) === Some(2L))
      // a removal naming a column the accepted data lacks fails NOW, by
      // name — persisting it would poison every later read's anti-join
      val bogus = intercept[IllegalArgumentException] {
        AcceptedSink.remove(spark, acc, Seq(1L).toDF("no_such"), "no_such")
      }
      assert(bogus.getMessage.contains("has no column 'no_such'"))
      // remove one ARCHIVED doc (batch 0) and one LIVE doc (batch 3):
      // both leave the read surface immediately, O(tombstones)
      AcceptedSink.remove(spark, acc, Seq(100L, 103L).toDF("doc_id"), "doc_id")
      assert(acceptedIds(acc) === Set(101L, 102L))
      val tombs = AcceptedSink.liveTombs(spark, acc).get.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tombs === Set((100L, 4L), (103L, 4L)),
        "minted_below records one past the highest live directory")
      // first archive compact: the folded bytes lose the archived id ON
      // DISK, but the tombstones CARRY (watermark 2 < minted_below-1=3:
      // the live batch=3 directory may still answer for them)
      val v1 = AcceptedSink.compactArchive(spark, acc).get
      val root = s"$acc/_archive"
      val folded = spark.read.parquet(s"$root/v=$v1/data")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(folded === Set(101L, 102L),
        "the compact must filter removed rows out of the folded bytes")
      assert(AcceptedSink.liveTombs(spark, acc).nonEmpty,
        "tombstones must carry while a live directory may hold their rows")
      assert(acceptedIds(acc) === Set(101L, 102L))
      // fold the last live directory past the mint point, compact again:
      // the debt clears — no live tombstones, no removed bytes anywhere
      assert(AcceptedSink.fold(spark, acc, belowBatch = 5L) === Some(3L))
      val v2 = AcceptedSink.compactArchive(spark, acc).get
      assert(AcceptedSink.liveTombs(spark, acc) === None)
      assert(spark.read.parquet(s"$root/v=$v2/data")
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(101L, 102L))
      assert(acceptedIds(acc) === Set(101L, 102L))
      // protocol edges: an empty removal is a no-op; a removal naming a
      // different id column fails by name — one sink, one id column
      assert(AcceptedSink.remove(spark, acc,
        Seq.empty[Long].toDF("doc_id"), "doc_id") === v2)
      AcceptedSink.remove(spark, acc, Seq(101L).toDF("doc_id"), "doc_id")
      val e = intercept[IllegalArgumentException] {
        AcceptedSink.remove(spark, acc, Seq(1L).toDF("vec_id"), "vec_id")
      }
      assert(e.getMessage.contains("one sink has one id column"))
      assert(acceptedIds(acc) === Set(102L))
    }
  }

  test("same-id resend outside checkpoint replay is NOT rejected — the documented source contract") {
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      // batch 0: doc 101 survives and is appended
      val o0 = process(docsDf((101L, uniq(101))), 0L, dir)
      assert(o0.accepted === 1L)
      // batch 1 resends THE SAME id with the same text — its standing
      // copy is its own group's representative, so the banded probe
      // drops the (101,101) self-pair and the resend is NOT rejected:
      // it re-appends and the id now appears twice in the merged index
      // (why the Scaladoc makes id non-redelivery the source's
      // contract, matching IvfIngestStream). A DIFFERENT id with the
      // same text is the supported path and rejects normally.
      val o1 = process(docsDf((101L, uniq(101))), 1L, dir)
      assert(o1.accepted === 1L,
        "pin the documented behavior: a same-id resend is not rejected")
      val merged = MinhashIndexStore.read(spark, s"$dir/store").index
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("ids")).as("id"))
        .where(org.apache.spark.sql.functions.col("id") === 101L).count()
      assert(merged === 2L,
        "the resend duplicates the id across chain links — the invariant breach the doc names")
      val o2 = process(docsDf((301L, uniq(101))), 2L, dir)
      assert(o2.accepted === 0L,
        "a resend under a different id rejects as an ordinary near-dup")
    }
  }

  test("merged-group valve pressure fails the batch by name before the compact") {
    withDir { dir =>
      // the loop's own appends cannot grow a group (an exact copy is
      // rejected before it reaches the index) — the pressure must come
      // from out of band, and the health check still catches it
      initStore(s"$dir/store", docsDf((1L, uniq(9))), maxGroupSize = 2)
      MinhashIndexStore.append(spark, s"$dir/store",
        docsDf((2L, uniq(9)), (3L, uniq(9))), "doc_id", "text",
        expectedBase = 0L) // per-link group size 2: passes the link valve
      val ex = intercept[IllegalStateException] {
        process(docsDf((101L, uniq(101))), 0L, dir, compactEvery = 1)
      }
      assert(ex.getMessage.contains("merged group mass 3"))
      assert(ex.getMessage.contains("maxGroupSize=2"))
      // the chain is intact: the batch's own append committed, no compact ran
      assert(MinhashIndexStore.latestVersion(spark, s"$dir/store") === Some(2L))
    }
  }

  test("a fresh checkpoint against an ingested store is refused by the owner stamp") {
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      process(docsDf((101L, uniq(101))), 0L, dir, checkpoint = "cp-a")
      val ex = intercept[IllegalArgumentException] {
        process(docsDf((102L, uniq(102))), 0L, dir, checkpoint = "cp-b")
      }
      assert(ex.getMessage.contains(s"ingested by checkpoint '$dir/cp-a'"))
    }
  }

  test("a checkpoint deleted and recreated at the same path is refused by the instance nonce") {
    withDir { dir =>
      initStore(s"$dir/store", docsDf((1L, uniq(1))))
      process(docsDf((101L, uniq(101))), 0L, dir, checkpoint = "cp-a")
      // a legitimate batch-0 replay from the INTACT checkpoint passes
      // (path and nonce both match)
      assert(process(docsDf((101L, uniq(101))), 0L, dir,
        checkpoint = "cp-a").replay)
      // the operator deletes the checkpoint and restarts "fresh" at the
      // SAME path: the path-only check would pass, the restarted batch
      // 0 would fresh-record a base (the old ledger entries were swept)
      // and silently re-append already-ingested documents — the nonce,
      // which lived in the deleted directory, refuses it by name
      import scala.reflect.io.Directory
      new Directory(new java.io.File(s"$dir/cp-a")).deleteRecursively()
      val ex = intercept[IllegalArgumentException] {
        process(docsDf((102L, uniq(102))), 0L, dir, checkpoint = "cp-a")
      }
      assert(ex.getMessage.contains("instance nonce is missing or different"))
      assert(ex.getMessage.contains("deleted and recreated"))
      // legacy stores stamped before the nonce existed keep the
      // path-only behavior (an old stamp must not brick its stream).
      // The direct overwrite must also drop Hadoop's checksum sibling,
      // or the protocol's read trips a ChecksumException
      val marker = java.nio.file.Paths.get(s"$dir/store/_ingest_owner")
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/store/._ingest_owner.crc"))
      java.nio.file.Files.write(marker,
        s"$dir/cp-a".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(process(docsDf((103L, uniq(103))), 0L, dir,
        checkpoint = "cp-a").replay)
    }
  }

  test("an uninitialized store is refused by name (init is the caller's explicit step)") {
    withDir { dir =>
      val ex = intercept[IllegalStateException] {
        process(docsDf((101L, uniq(101))), 0L, dir)
      }
      assert(ex.getMessage.contains("no committed index version"))
    }
  }
}
