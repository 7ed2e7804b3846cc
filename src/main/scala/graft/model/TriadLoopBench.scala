package graft.model

import org.apache.spark.sql.functions.{col, lit, pmod, substring}

import graft.streaming.{AcceptedSink, CurationGate, TriadPipeline}

/** Measures the COMPOSED pipeline end-to-end — [[TriadPipeline]]'s
  * scale claim is that composition adds NOTHING to the per-batch cost
  * model (each stage keeps its own O(batch) economics; the inter-stage
  * handoff is a survivor-mass parquet read), and [[IngestLoopBench]]
  * already measures each stage alone. This main makes the composition
  * claim a reading: per-batch wall for the full
  * curation → dedup → semantic → IVF chain with stats-indexed accepted
  * folds, across 8 batches with the cadence tripping twice, followed by
  * the operational verbs a production day ends with — the structural
  * audit (claim: fs-metadata-only, composition-independent), the deep
  * audit (O(corpus), the scheduled-job class), and the last mile
  * (shard export + receipt verification over the final accepted
  * corpus).
  *
  * Round 19 adds a SECOND sweep with the LINKAGE TAIL configured
  * (fresh root, same batches) so the fourth stage's marginal per-batch
  * cost is a paired reading against the base sweep — the composition
  * claim extended: the tail must add only the linkage loop's own
  * standalone terms ([[LinkageLoopBench]]), nothing cross-stage.
  * Linkage resolves the 10-char text prefix within `lang` blocks (the
  * q_triad_linkage fixture).
  *
  * Input rows carry text AND embedding (documents ⋈ embeddings on id;
  * the standing half is even ids, batches are 8 disjoint odd-id
  * slices — the IngestLoopBench geometry, `SPARK_GRAFT_BATCH_DENOM`
  * honored the same way for the fixed-batch decade experiment).
  * Single pass per sweep (the pipeline is stateful); loadavg printed
  * for adjudication (SCALE.md bench doctrine).
  *
  * Usage: `runMain graft.model.TriadLoopBench [sfDir]`. One JSON
  * line. */
object TriadLoopBench {
  import BenchHarness.time

  private def r3(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private def loadavg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val (spark, dir) = BenchHarness.session(args, "/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("triad-bench").toString
    val before = loadavg()
    try {
      val Batches = 8
      val denom = sys.env.get("SPARK_GRAFT_BATCH_DENOM").map(_.trim.toInt)
        .getOrElse(16)
      require(denom >= 16 && denom % 16 == 0,
        s"SPARK_GRAFT_BATCH_DENOM must be a positive multiple of 16, got $denom")
      val step = denom / 8
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"),
          substring(col("text"), 1, 10).as("sig"))
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val joined = docs.join(vecs, Seq("doc_id")).cache()
      val total = joined.count()
      val standing = joined.where(pmod(col("doc_id"), lit(2)) === 0)

      /** One full sweep under `sub`; returns (initSec, per-batch rows,
        * auditSec, deepSec, cfg). */
      def sweep(sub: String, linkage: Option[TriadPipeline.LinkageStage])
        : (Double, Seq[String], Double, Double, TriadPipeline.Config) = {
        val cfg = TriadPipeline.Config(s"$root/$sub", "doc_id", "text",
          "embedding", checkpointDir = s"$root/$sub/bench-cp",
          semanticThreshold = 0.9,
          minhashCompactEvery = 4, vectorCompactEvery = 4,
          curation = Some(CurationGate.Rule(minQuality = 0.05, minTokens = 3)),
          acceptedStatsCols = Seq("doc_id", "batch"), linkage = linkage)
        val (initSec, _) = time {
          graft.ops.MinhashIndexStore.init(standing, cfg.minhashDir,
            "doc_id", "text", shingleK = 5, numBands = 24, rowsPerBand = 2)
          graft.ops.SemanticIndexStore.init(standing, cfg.semanticDir,
            "doc_id", "embedding", nlist = 16)
          graft.ops.IvfIndexStore.init(standing, cfg.ivfDir,
            "doc_id", "embedding", nlist = 16)
          if (linkage.nonEmpty) TriadPipeline.initLinkageStore(spark, cfg): Unit
        }
        val batchRows = (0 until Batches).map { b =>
          val batch = joined.where(pmod(col("doc_id"), lit(denom)) === step * b + 1)
          val (sec, o) = time(TriadPipeline.processBatch(batch, b.toLong, cfg))
          // per-stage breakdown: the host's documented multi-fold sweep
          // scatter swamps a whole-batch A/B marginal, so the tail
          // stage's cost is read off ITS OWN timer, not a subtraction
          val stages = o.stageSecs.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString(",")
          s"""{"b":$b,"sec":${r3(sec)},"gate_kept":${o.curation.map(_.kept).getOrElse(-1L)},""" +
            s""""dedup_acc":${o.dedup.accepted},"sem_acc":${o.semantic.accepted},""" +
            s""""ivf_app":${o.ivf.appended},"compacted":${o.dedup.compactedTo.nonEmpty},""" +
            s""""stages":{$stages}""" +
            o.linkage.map(l => s""","link_v":${l.version}""").getOrElse("") + "}"
        }
        val (auditSec, structural) = time(TriadPipeline.audit(spark, cfg))
        val (deepSec, deep) = time(TriadPipeline.audit(spark, cfg, deep = true))
        require(structural.ok && deep.ok,
          s"the bench pipeline must audit clean: $structural / $deep")
        (initSec, batchRows, auditSec, deepSec, cfg)
      }

      val (initSec, batchRows, auditSec, deepSec, cfg) = sweep("base", None)
      val (lInitSec, lBatchRows, lAuditSec, lDeepSec, _) = sweep("linked",
        Some(TriadPipeline.LinkageStage("sig", Seq("lang"), maxDist = 3,
          compactEvery = 4)))
      val (exportSec, manifest) = time {
        val m = graft.ops.Curation.exportShards(
          AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
            .select("doc_id", "text"), "doc_id", 16, s"$root/shards")
        m.count()
      }
      val (receiptSec, bad) = time(
        graft.ops.Curation.verifyShards(spark, s"$root/shards",
          "doc_id").count())
      require(bad == 0L, "the receipt must verify")
      println(s"""{"bench":"triad_loop","sf":"$dir","rows":$total,""" +
        s""""init_sec":${r3(initSec)},"batches":[${batchRows.mkString(",")}],""" +
        s""""audit_sec":${r3(auditSec)},"deep_audit_sec":${r3(deepSec)},""" +
        s""""linked_init_sec":${r3(lInitSec)},""" +
        s""""linked_batches":[${lBatchRows.mkString(",")}],""" +
        s""""linked_audit_sec":${r3(lAuditSec)},""" +
        s""""linked_deep_audit_sec":${r3(lDeepSec)},""" +
        s""""export_sec":${r3(exportSec)},"shards":$manifest,""" +
        s""""receipt_sec":${r3(receiptSec)},""" +
        s""""load_before":${r3(before)},"load_after":${r3(loadavg())}}""")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
      spark.stop()
    }
  }
}
