package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod}
import graft.SparkSpec
import graft.sources.StatsIndex

/** Specs for the accepted corpus's data-skipping and reproducible-read
  * surfaces — the per-version `stats` subframe the [[AcceptedSink.fold]]
  * overload maintains, [[AcceptedSink.prunedReadAccepted]] over both
  * tiers, and [[AcceptedSink.readAcceptedAsOf]]'s invariance across
  * folds/compacts plus its retroactive-takedown rule. */
class AcceptedSkipSpec extends SparkSpec {
  import spark.implicits._

  /** One accepted batch directory: ids in [b*1000, b*1000+n) with a
    * `src` label — disjoint id ranges per batch, so file-level min/max
    * stats can actually separate them. */
  private def writeBatch(dir: String, b: Long, n: Int = 50,
                         src: String = "web"): Unit =
    (0 until n).map(i => (b * 1000L + i, src, s"doc $b-$i"))
      .toDF("doc_id", "src", "text")
      .coalesce(1).write.parquet(s"$dir/batch=$b")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("accepted-skip").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def idsOf(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("pruned read skips whole files across both tiers and answers exactly") {
    withDir { root =>
      val acc = s"$root/accepted"
      (0L to 3L).foreach(writeBatch(acc, _))
      // archive batches 0-3 with a stats index on (doc_id, batch)
      assert(AcceptedSink.fold(spark, acc, belowBatch = 4L,
        statsCols = Seq("doc_id", "batch")) === Some(3L))
      writeBatch(acc, 4L)
      writeBatch(acc, 5L)
      val statsCols = Seq("doc_id", "batch")
      // point-range predicate landing entirely in live batch 5: the
      // archive file and the batch-4 file are skipped
      val hit = AcceptedSink.prunedReadAccepted(spark, acc, statsCols,
        StatsIndex.mayContainBetween("doc_id", 5000L, 5049L),
        col("doc_id").between(5000L, 5049L))
      assert(hit.totalFiles === 3 && hit.keptFiles === 1,
        s"kept ${hit.keptFiles} of ${hit.totalFiles}")
      assert(idsOf(hit.df) === (5000L until 5050L).toSet)
      assert(idsOf(hit.df) === idsOf(
        AcceptedSink.readAccepted(spark, acc)
          .where(col("doc_id").between(5000L, 5049L))),
        "pruned read must equal the unpruned filtered read")
      // batch-range predicate: as-of through the skipping path — only
      // the archive file is read, the live tier prunes on its directory
      // names without `batch` being a data column there
      val asOf = AcceptedSink.prunedReadAccepted(spark, acc, statsCols,
        StatsIndex.mayContainBetween("batch", 0L, 3L),
        col("batch") <= 3L)
      assert(asOf.keptFiles === 1, s"kept ${asOf.keptFiles}")
      // plan-level pin: the frame is BACKED by exactly the kept files —
      // the skipped ones never enter the scan, they aren't filtered out
      assert(asOf.df.inputFiles.length === asOf.keptFiles)
      assert(idsOf(asOf.df) ===
        idsOf(AcceptedSink.readAcceptedAsOf(spark, acc, 3L)))
      // a miss everywhere returns a schema'd empty, zero files read
      val miss = AcceptedSink.prunedReadAccepted(spark, acc, statsCols,
        StatsIndex.mayContainBetween("doc_id", 999999L, 999999L),
        col("doc_id") === 999999L)
      assert(miss.keptFiles === 0 && miss.df.isEmpty)
    }
  }

  test("an archive version without stats reads whole — sound, never wrong") {
    withDir { root =>
      val acc = s"$root/accepted"
      (0L to 1L).foreach(writeBatch(acc, _))
      assert(AcceptedSink.fold(spark, acc, belowBatch = 2L) === Some(1L))
      writeBatch(acc, 2L)
      val scan = AcceptedSink.prunedReadAccepted(spark, acc, Seq("doc_id"),
        StatsIndex.mayContainBetween("doc_id", 0L, 49L),
        col("doc_id") <= 49L)
      // the statless archive file is read (counted kept), the live
      // batch-2 file prunes via its on-the-fly footer stats
      assert(scan.totalFiles === 2 && scan.keptFiles === 1)
      assert(idsOf(scan.df) === (0L until 50L).toSet)
    }
  }

  test("external tampering with an indexed version fails by name") {
    withDir { root =>
      val acc = s"$root/accepted"
      (0L to 1L).foreach(writeBatch(acc, _))
      AcceptedSink.fold(spark, acc, belowBatch = 2L,
        statsCols = Seq("doc_id"))
      val fs = new org.apache.hadoop.fs.Path(acc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dataDir = new org.apache.hadoop.fs.Path(s"$acc/_archive/v=0/data")
      val part = fs.listStatus(dataDir).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.delete(part, false)
      val e = intercept[IllegalArgumentException] {
        AcceptedSink.prunedReadAccepted(spark, acc, Seq("doc_id"),
          StatsIndex.mayContainBetween("doc_id", 0L, 10L),
          col("doc_id") <= 10L)
      }
      assert(e.getMessage.contains("external tampering"), e.getMessage)
    }
  }

  test("as-of reads are invariant across fold and compact, and takedown is retroactive") {
    withDir { root =>
      val acc = s"$root/accepted"
      (0L to 4L).foreach(writeBatch(acc, _, n = 10))
      val before = idsOf(AcceptedSink.readAcceptedAsOf(spark, acc, 2L))
      assert(before === (0L to 2L).flatMap(b =>
        (0 until 10).map(b * 1000L + _)).toSet)
      // fold 0-3, leave 4 live, then compact the archive: the as-of cut
      // must be bit-stable because `batch` rides as a data column
      AcceptedSink.fold(spark, acc, belowBatch = 4L,
        statsCols = Seq("batch"))
      assert(idsOf(AcceptedSink.readAcceptedAsOf(spark, acc, 2L)) === before)
      AcceptedSink.compactArchive(spark, acc, Seq("batch"))
      assert(idsOf(AcceptedSink.readAcceptedAsOf(spark, acc, 2L)) === before)
      // takedown is retroactive: a document withdrawn AFTER batch 2
      // does not resurface in the batch-2 corpus
      AcceptedSink.remove(spark, acc, Seq(1001L).toDF("doc_id"), "doc_id")
      assert(idsOf(AcceptedSink.readAcceptedAsOf(spark, acc, 2L)) ===
        before - 1001L)
      // and the pruned-read surface honors the same tombstones
      val pruned = AcceptedSink.prunedReadAccepted(spark, acc, Seq("batch"),
        StatsIndex.mayContainBetween("batch", 1L, 1L), col("batch") === 1L)
      assert(idsOf(pruned.df) === (0 until 10).map(1000L + _).toSet - 1001L)
    }
  }

  test("as-of-pinned shard export: reproducible, takedown shifts exactly the withdrawn ids") {
    import graft.ops.Curation
    withDir { root =>
      val acc = s"$root/accepted"
      (0L to 2L).foreach(b => writeBatch(acc, b))
      AcceptedSink.fold(spark, acc, belowBatch = 2L)
      def manifest(out: String): Map[Int, (Long, BigInt)] =
        AcceptedSink.exportShardsAsOf(spark, acc, asOfBatch = 1L,
          "doc_id", numShards = 4, out)
          .collect().map(r => r.getInt(0) ->
            (r.getLong(1), BigInt(r.getString(2)))).toMap
      val m1 = manifest(s"$root/e1")
      // equal corpus state → bit-identical manifest, clean pin
      assert(manifest(s"$root/e1b") === m1)
      val p1 = AcceptedSink.shardProvenance(spark, s"$root/e1").head()
      assert((p1.getLong(0), p1.getLong(1), p1.getString(2), p1.getLong(3))
        === ((1L, 0L, "0", -1L)))
      // takedown: one id inside the as-of range, one outside — BOTH are
      // stamped (the pin names the tombstone state, not its overlap)
      AcceptedSink.remove(spark, acc,
        Seq(1005L, 2001L).toDF("doc_id"), "doc_id")
      val m2 = manifest(s"$root/e2")
      val key1005 = spark.range(1).select(
        Curation.shuffleKey(lit(1005L)).cast("decimal(20,0)").cast("string"))
        .head().getString(0)
      val hitShard = spark.range(1).select(
        pmod(Curation.shuffleKey(lit(1005L)), lit(4L)).cast("int"))
        .head().getInt(0)
      // exactly the withdrawn in-range id left its shard; nothing else
      assert(m2.keySet === m1.keySet)
      m1.keySet.foreach { s =>
        if (s == hitShard) {
          assert(m2(s)._1 === m1(s)._1 - 1, s"shard $s row count")
          assert(m2(s)._2 === m1(s)._2 - BigInt(key1005), s"shard $s checksum")
        } else assert(m2(s) === m1(s), s"shard $s must be untouched")
      }
      val p2 = AcceptedSink.shardProvenance(spark, s"$root/e2").head()
      assert(p2.getLong(1) === 2L)
      assert(p2.getLong(3) === 3L, "minted below = max live batch + 1")
      val bothKeys = spark.range(1).select(
        (Curation.shuffleKey(lit(1005L)).cast("decimal(20,0)") +
          Curation.shuffleKey(lit(2001L)).cast("decimal(20,0)"))
          .cast("string")).head().getString(0)
      assert(p2.getString(2) === bothKeys)
      // the receipt still verifies from the ids alone
      assert(Curation.verifyShards(spark, s"$root/e2", "doc_id").isEmpty)
    }
  }

  test("the ingest loop maintains the stats index on its fold cadence") {
    import graft.ops.MinhashIndexStore
    withDir { root =>
      def uniq(i: Long): String =
        (0 until 12).map(w => s"w${i}x$w").mkString(" ")
      val idx = s"$root/idx"
      val acc = s"$root/accepted"
      val cp = s"$root/cp"
      MinhashIndexStore.init(
        (1L to 5L).map(i => (i, uniq(i))).toDF("doc_id", "text"),
        idx, "doc_id", "text", shingleK = 5, numBands = 24, rowsPerBand = 2)
      // compactEvery=1 trips the cadence (and the accepted fold) on the
      // second batch
      (0L to 1L).foreach { b =>
        DedupIngestStream.processBatch(
          Seq((100L + b, uniq(100L + b))).toDF("doc_id", "text"), b,
          idx, acc, "doc_id", "text", threshold = 0.5, compactEvery = 1,
          checkpointDir = cp, acceptedStatsCols = Seq("doc_id", "batch"))
      }
      val fs = new org.apache.hadoop.fs.Path(acc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$acc/_archive/v=0/stats/_SUCCESS")),
        "the cadence fold must write the stats subframe")
      val scan = AcceptedSink.prunedReadAccepted(spark, acc,
        Seq("doc_id", "batch"),
        StatsIndex.mayContainEq("doc_id", 100L), col("doc_id") === 100L)
      assert(scan.keptFiles === 1 && idsOf(scan.df) === Set(100L))
    }
  }
}
