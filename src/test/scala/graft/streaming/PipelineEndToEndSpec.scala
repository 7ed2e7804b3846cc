package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import graft.SparkSpec
import graft.ops.{Curation, IvfIndexStore, MinhashIndexStore, SemanticIndexStore}
import graft.sources.StatsIndex

/** The whole production story in ONE test: a standing corpus, the
  * composed triad with the curation front gate and stats-indexed
  * accepted folds, a takedown mid-stream, the fsck, a reproducible
  * as-of read through the skipping surface, and the last mile —
  * training shards with a verified receipt. No step is mocked; every
  * surface is the one a production consumer would call. The point is
  * COMPOSITION: each piece is spec-pinned alone, this pins that they
  * compose without contradicting each other's contracts. */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(i: Long): String =
    (0 until 14).map(w => s"w${i}x$w").mkString(" ")

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }

  private def rows(rs: (Long, String, Array[Float])*): DataFrame =
    rs.toDF("doc_id", "text", "embedding")

  test("corpus to verified training shards, end to end") {
    val root = java.nio.file.Files.createTempDirectory("e2e").toString
    try {
      val cfg = TriadPipeline.Config(root, "doc_id", "text", "embedding",
        checkpointDir = s"$root/cp", semanticThreshold = 0.9,
        minhashCompactEvery = 2, vectorCompactEvery = 2,
        curation = Some(CurationGate.Rule(minQuality = 0.05, minTokens = 5)),
        acceptedStatsCols = Seq("doc_id", "batch"))
      val corpus = rows((1L to 20L).map(i => (i, uniq(i), base(i.toInt))): _*)
      MinhashIndexStore.init(corpus, cfg.minhashDir, "doc_id", "text",
        shingleK = 5, numBands = 24, rowsPerBand = 2)
      SemanticIndexStore.init(corpus, cfg.semanticDir, "doc_id", "embedding",
        nlist = 4)
      IvfIndexStore.init(corpus, cfg.ivfDir, "doc_id", "embedding", nlist = 4)

      // five batches: fresh survivors, a text dup (dies at stage 1), a
      // semantic near-dup (dies at stage 2), a curation reject (dies at
      // the front gate), across enough cadence trips (compactEvery=2)
      // that the accepted sinks FOLD with the stats index
      val batches = Seq(
        rows((101L, uniq(101), base(101)), (102L, uniq(3), base(102))),
        rows((201L, uniq(201), base(201)), (202L, "too short", base(202))),
        rows((301L, uniq(301), jitter(base(101)))),
        rows((401L, uniq(401), base(401))),
        rows((501L, uniq(501), base(501))))
      val outcomes = batches.zipWithIndex.map { case (b, i) =>
        TriadPipeline.processBatch(b, i.toLong, cfg)
      }
      assert(outcomes(0).dedup.accepted === 1L, "text dup 102 dies at stage 1")
      assert(outcomes(1).curation.get.rejected === 1L, "202 dies at the gate")
      assert(outcomes(2).semantic.accepted === 0L, "301 dies at stage 2")
      // the cadence tripped at least once: the accepted corpus is
      // two-tier and its archive carries the stats subframe
      assert(AcceptedSink.maxFoldedBatch(spark, cfg.semanticAccepted).nonEmpty,
        "the fold cadence must have tripped")
      val (fs, _) = graft.ops.VersionedState.fsPath(spark, root)
      val archived = AcceptedSink.archiveChain(spark, cfg.semanticAccepted)
      assert(archived.exists(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"${cfg.semanticAccepted}/_archive/v=$v/stats/_SUCCESS"))),
        "a cadence fold must have written the stats index")

      // the rejected-audit log rode the same fold lifecycle: its batch
      // directories bound to cadence trips, its verdicts intact across
      // the fold (202's rejection is still on the record, text-free)
      assert(AcceptedSink.maxFoldedBatch(spark, cfg.curationRejected).nonEmpty,
        "the rejected audit must fold on the cadence")
      val rejectedLog = AcceptedSink.readAccepted(spark, cfg.curationRejected)
      assert(rejectedLog.where(col("doc_id") === 202L).count() === 1L)
      assert(!rejectedLog.columns.contains("text"))

      // the corpus as the consumer sees it
      def ids(dir: String): Set[Long] =
        AcceptedSink.readAccepted(spark, dir)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids(cfg.semanticAccepted) === Set(101L, 201L, 401L, 501L))

      // reproducibility: pin batch 1, ingest moved on, the pin holds
      val asOf1 = AcceptedSink.readAcceptedAsOf(spark, cfg.semanticAccepted, 1L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(asOf1 === Set(101L, 201L))

      // takedown 201 everywhere; as-of is retroactive; audit stays clean
      TriadPipeline.takedown(spark, cfg, Seq(201L).toDF("doc_id"))
      assert(ids(cfg.semanticAccepted) === Set(101L, 401L, 501L))
      assert(AcceptedSink.readAcceptedAsOf(spark, cfg.semanticAccepted, 1L)
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(101L))
      val audit = TriadPipeline.audit(spark, cfg, deep = true)
      assert(audit.ok, audit.toString)

      // the skipping surface agrees with the plain read after all of it
      val pruned = AcceptedSink.prunedReadAccepted(spark, cfg.semanticAccepted,
        Seq("doc_id", "batch"), StatsIndex.mayContainBetween("batch", 0L, 1L),
        col("batch") <= 1L)
      assert(pruned.df.select("doc_id").collect().map(_.getLong(0)).toSet
        === Set(101L))

      // last mile: shards + verified receipt over the final corpus
      val shardDir = s"$root/shards"
      val manifest = Curation.exportShards(
        AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
          .select("doc_id", "text"), "doc_id", 2, shardDir)
      assert(manifest.agg(org.apache.spark.sql.functions.sum("n_rows"))
        .head.getLong(0) === 3L)
      assert(Curation.verifyShards(spark, shardDir, "doc_id").isEmpty,
        "the shipped shards must verify against their manifest")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def jitter(v: Array[Float]): Array[Float] = {
    val w = v.clone(); w(0) = w(0) + 0.01f; w
  }
}
