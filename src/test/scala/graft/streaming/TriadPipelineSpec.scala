package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.SparkSpec
import graft.ops.{Dedup, IvfIndexStore, LinkageStore, MinhashIndexStore, SemanticIndexStore}

/** End-to-end specs for [[TriadPipeline]] — the composed
  * dedup → semantic → IVF ingest topology: per-stage screening with
  * cross-batch statefulness at BOTH screens, survivor handoff through
  * committed bytes, and crash replay across a stage boundary (the
  * interleaving no single loop's spec can pin). */
class TriadPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Doc-unique texts (zero shared shingles across ids — the
    * DedupIngestStreamSpec fixture). */
  private def uniq(i: Long): String =
    (0 until 12).map(w => s"w${i}x$w").mkString(" ")

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }
  private def jitter(v: Array[Float]): Array[Float] = {
    val w = v.clone(); w(0) = w(0) + 0.01f; w
  }

  private def rows(rs: (Long, String, Array[Float])*): DataFrame =
    rs.toDF("doc_id", "text", "embedding")

  private def cfgFor(root: String): TriadPipeline.Config =
    TriadPipeline.Config(root, "doc_id", "text", "embedding",
      checkpointDir = s"$root/triad-cp", semanticThreshold = 0.9)

  private def initStores(cfg: TriadPipeline.Config, corpus: DataFrame): Unit = {
    MinhashIndexStore.init(corpus, cfg.minhashDir, "doc_id", "text",
      shingleK = 5, numBands = 24, rowsPerBand = 2)
    SemanticIndexStore.init(corpus, cfg.semanticDir, "doc_id", "embedding",
      nlist = 4)
    IvfIndexStore.init(corpus, cfg.ivfDir, "doc_id", "embedding", nlist = 4)
  }

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("triad").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def semIds(cfg: TriadPipeline.Config): Seq[Long] =
    SemanticIndexStore.read(spark, cfg.semanticDir).cells
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("ids")).as("id"))
      .collect().map(_.getLong(0)).toSeq

  private def ivfTop1(cfg: TriadPipeline.Config, v: Array[Float]): Long =
    IvfIndexStore.probeLatest(spark, cfg.ivfDir,
      Seq((999L, v)).toDF("doc_id", "embedding"), "doc_id", "embedding",
      k = 1, nprobe = 4)
      .orderBy("rank").limit(1).collect()(0).getLong(1)

  test("three batches: both screens stateful across batches, survivors reach the IVF index") {
    withDir { root =>
      val cfg = cfgFor(root)
      val corpus = rows((1L to 20L).map(i => (i, uniq(i), base(i.toInt))): _*)
      initStores(cfg, corpus)
      // batch 0: 101 fresh everything; 102 is a TEXT copy of corpus doc
      // 3 (dies at the dedup screen); 103 has fresh text but a vector
      // semantically near standing doc 5 (passes dedup, dies at the
      // semantic screen); 104 fresh everything
      val o0 = TriadPipeline.processBatch(rows(
        (101L, uniq(101), base(101)), (102L, uniq(3), base(102)),
        (103L, uniq(103), jitter(base(5))), (104L, uniq(104), base(104))),
        0L, cfg)
      assert(o0.dedup.accepted === 3L, "102 dies at the text screen")
      assert(o0.semantic.accepted === 2L, "103 dies at the semantic screen")
      assert(o0.ivf.appended === 2L)
      assert(semIds(cfg).toSet === (1L to 20L).toSet ++ Set(101L, 104L))
      assert(ivfTop1(cfg, base(101)) === 101L,
        "a both-screens survivor must be retrievable")
      // batch 1: 201 is a text copy of batch-0 SURVIVOR 101 (the dedup
      // screen is stateful across batches); 202 is semantically near
      // batch-0 SEMANTIC SURVIVOR 104 (that screen is stateful too);
      // 203 fresh
      val o1 = TriadPipeline.processBatch(rows(
        (201L, uniq(101), base(201)), (202L, uniq(202), jitter(base(104))),
        (203L, uniq(203), base(203))),
        1L, cfg)
      assert(o1.dedup.accepted === 2L, "201 rejects against survivor 101")
      assert(o1.semantic.accepted === 1L, "202 rejects against survivor 104")
      assert(o1.ivf.appended === 1L)
      assert(ivfTop1(cfg, base(203)) === 203L)
      // batch 2: everything dies at the FIRST screen — the downstream
      // stages see an empty survivor set and no-op without growing
      // their chains
      val semHead = SemanticIndexStore.latestVersion(spark, cfg.semanticDir)
      val ivfHead = IvfIndexStore.latestVersion(spark, cfg.ivfDir)
      val o2 = TriadPipeline.processBatch(rows(
        (301L, uniq(101), base(301)), (302L, uniq(203), base(302))),
        2L, cfg)
      assert(o2.dedup.accepted === 0L)
      assert(o2.semantic.accepted === 0L && o2.ivf.appended === 0L)
      assert(SemanticIndexStore.latestVersion(spark, cfg.semanticDir) === semHead)
      assert(IvfIndexStore.latestVersion(spark, cfg.ivfDir) === ivfHead)
      // the final accepted corpus is the both-screens survivor set
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(101L, 104L, 203L))
    }
  }

  test("curation front gate: text-free rejected audit, PII redacted before hashing, replay-stable") {
    withDir { root =>
      val cfg = cfgFor(root).copy(curation =
        Some(CurationGate.Rule(minQuality = 0.05, minTokens = 5)))
      initStores(cfg, rows((1L to 5L).map(i => (i, uniq(i), base(i.toInt))): _*))
      // 101 clean; 102 under the token floor; 103 empty; 104 clean but
      // carries an email — kept WITH the span redacted
      val mail = uniq(104) + " contact ops-team@example.com for access"
      val b0 = rows((101L, uniq(101), base(101)), (102L, "too short", base(102)),
        (103L, "", base(103)), (104L, mail, base(104)))
      val o0 = TriadPipeline.processBatch(b0, 0L, cfg)
      assert(o0.curation === Some(CurationGate.BatchOutcome(0L, 4L, 2L, 2L)))
      assert(o0.dedup.accepted === 2L && o0.ivf.appended === 2L)
      // the audit carries verdicts, never content
      val audit = spark.read.parquet(s"${cfg.curationRejected}/batch=0")
      assert(audit.columns.toSeq ===
        Seq("doc_id", "reason", "n_tokens", "quality", "lang"))
      assert(audit.select("doc_id", "reason").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap ===
        Map(102L -> "tokens", 103L -> "empty"))
      // the accepted corpus holds the REDACTED text (scrub-then-commit)
      val kept104 = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .where($"doc_id" === 104L).select("text").collect()(0).getString(0)
      assert(kept104.contains("<EMAIL>") && !kept104.contains("example.com"))
      // ...and the SIGNATURE was taken over the redacted text: a later
      // arrival of the already-redacted form is a near-dup and rejects
      val redactedTwin = uniq(104) + " contact <EMAIL> for access"
      val o1 = TriadPipeline.processBatch(
        rows((201L, redactedTwin, base(201))), 1L, cfg)
      assert(o1.curation.map(_.kept) === Some(1L))
      assert(o1.dedup.accepted === 0L,
        "the redacted twin must reject against 104's redacted signature")
      // checkpoint replay of the LATEST batch (the only interleaving
      // the ledger protocol admits — older entries are swept): the gate
      // recomputes identical verdicts, the stateful stages follow their
      // replay rules — no duplicate ids anywhere
      val r1 = TriadPipeline.processBatch(
        rows((201L, redactedTwin, base(201))), 1L, cfg)
      assert(r1.curation === o1.curation)
      assert(r1.dedup.replay && r1.dedup.accepted === 0L)
      assert(semIds(cfg).count(_ == 104L) === 1, "no duplicate ids on replay")
    }
  }

  test("retrain verb: refuses a pending-replay checkpoint, rebases the vector stores on the accepted corpus, ingest resumes") {
    withDir { root =>
      val cfg = cfgFor(root)
      initStores(cfg, rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*))
      TriadPipeline.processBatch(rows(
        (101L, uniq(101), base(101)), (102L, uniq(102), base(102))), 0L, cfg)
      TriadPipeline.processBatch(rows((201L, uniq(201), base(201))), 1L, cfg)
      // checkpoint state as a real stream would leave it mid-batch-2:
      // offsets 0..2 written, commits only 0..1 — batch 2 pends replay
      def mark(sub: String, ids: Seq[Int]): Unit = {
        val d = new java.io.File(cfg.checkpointDir, sub); d.mkdirs()
        ids.foreach(i => java.nio.file.Files.write(
          d.toPath.resolve(i.toString), "v1".getBytes))
      }
      mark("offsets", Seq(0, 1, 2)); mark("commits", Seq(0, 1))
      val ex = intercept[IllegalStateException](
        TriadPipeline.retrainVectorStores(spark, cfg, 4, 4))
      assert(ex.getMessage.contains("pending replay") &&
        ex.getMessage.contains("batch 2"))
      // the batch commits → retrain proceeds: both vector stores rebase
      // on the accepted corpus at v=0 (the standing 1-10 — never
      // accepted, only init-time state — drop out: drift retrain trains
      // on what the pipeline actually accepted)
      mark("commits", Seq(2))
      val o = TriadPipeline.retrainVectorStores(spark, cfg, 4, 4)
      assert(o === TriadPipeline.RetrainOutcome(3L, 0L, 0L))
      assert(semIds(cfg).toSet === Set(101L, 102L, 201L))
      assert(ivfTop1(cfg, base(201)) === 201L)
      // ingest continues against the rebuilt stores (fresh ledger base);
      // the MINHASH store was untouched — its standing survivor 201
      // still rejects a text twin
      val o2 = TriadPipeline.processBatch(rows(
        (301L, uniq(301), base(301)), (302L, uniq(201), base(302))), 3L, cfg)
      assert(o2.dedup.accepted === 1L, "302 must reject against survivor 201")
      assert(semIds(cfg).toSet === Set(101L, 102L, 201L, 301L))
      assert(ivfTop1(cfg, base(301)) === 301L)
    }
  }

  test("crash replay across a stage boundary: committed stages skip, the crashed stage redoes, no id duplicates") {
    withDir { root =>
      val cfg = cfgFor(root)
      val corpus = rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*)
      initStores(cfg, corpus)
      TriadPipeline.processBatch(rows((101L, uniq(101), base(101))), 0L, cfg)
      // batch 1 "crashes" BETWEEN stages: stage 1 ran to completion
      // (probe + accepted write + append + ledger), then the driver
      // died before stage 2 ever saw the batch
      val b1 = rows((201L, uniq(201), base(201)))
      DedupIngestStream.processBatch(b1, 1L, cfg.minhashDir,
        cfg.minhashAccepted, "doc_id", "text", threshold = 0.5,
        compactEvery = 8, checkpointDir = cfg.checkpointDir)
      assert(MinhashIndexStore.latestVersion(spark, cfg.minhashDir) === Some(2L))
      // foreachBatch re-delivers batch 1 to the WHOLE pipeline: the
      // committed stage replays (skips its append, rewrites its
      // deterministic output), the never-ran stages run fresh
      val o1 = TriadPipeline.processBatch(b1, 1L, cfg)
      assert(o1.dedup.replay && o1.dedup.appendSkipped)
      assert(!o1.semantic.replay && o1.semantic.accepted === 1L)
      assert(!o1.ivf.replay && o1.ivf.appended === 1L)
      // no id entered any store twice
      assert(MinhashIndexStore.latestVersion(spark, cfg.minhashDir) === Some(2L))
      assert(semIds(cfg).count(_ == 201L) === 1)
      assert(ivfTop1(cfg, base(201)) === 201L)
      // a SECOND replay of the same batch (crash after everything
      // committed, before the checkpoint): every stage skips its
      // append, outputs rewrite stably, stores unchanged
      val heads = (MinhashIndexStore.latestVersion(spark, cfg.minhashDir),
        SemanticIndexStore.latestVersion(spark, cfg.semanticDir),
        IvfIndexStore.latestVersion(spark, cfg.ivfDir))
      val o2 = TriadPipeline.processBatch(b1, 1L, cfg)
      assert(o2.dedup.replay && o2.dedup.appendSkipped)
      assert(o2.semantic.replay && o2.semantic.appendSkipped)
      assert(o2.ivf.replay && o2.ivf.appendSkipped)
      assert((MinhashIndexStore.latestVersion(spark, cfg.minhashDir),
        SemanticIndexStore.latestVersion(spark, cfg.semanticDir),
        IvfIndexStore.latestVersion(spark, cfg.ivfDir)) === heads)
      assert(semIds(cfg).count(_ == 201L) === 1)
      // the survivor sets are byte-stable across the replays
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(101L, 201L))
    }
  }

  test("takedown withdraws a document from all five surfaces — and the content is re-ingestable, as-if-never-ingested") {
    withDir { root =>
      val cfg = cfgFor(root)
      val corpus = rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*)
      initStores(cfg, corpus)
      TriadPipeline.processBatch(rows(
        (101L, uniq(101), base(101)), (102L, uniq(102), base(102))), 0L, cfg)
      assert(ivfTop1(cfg, base(101)) === 101L)
      // takedown doc 101: five O(tombstones) writes, one verb
      val o = TriadPipeline.takedown(spark, cfg, Seq(101L).toDF("doc_id"))
      assert(o.minhashAcceptedVersion.nonEmpty
        && o.semanticAcceptedVersion.nonEmpty)
      // not training data anymore — gone from both accepted corpora
      assert(!AcceptedSink.readAccepted(spark, cfg.minhashAccepted)
        .select("doc_id").collect().map(_.getLong(0)).contains(101L))
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(102L))
      // not retrievable anymore — the IVF probe's slot goes elsewhere
      assert(ivfTop1(cfg, base(101)) !== 101L)
      // and not a suppressor anymore: the SAME content under a fresh id
      // sails through both screens on the next batch — takedown means
      // "as if never ingested", not "banned"
      val o1 = TriadPipeline.processBatch(rows(
        (301L, uniq(101), base(101))), 1L, cfg)
      assert(o1.dedup.accepted === 1L && o1.semantic.accepted === 1L
        && o1.ivf.appended === 1L)
      assert(ivfTop1(cfg, base(101)) === 301L)
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(102L, 301L))
      // a checkpoint holding a batch pending replay refuses the verb:
      // advancing a store head now would make the resumed batch read
      // its own append as committed and skip it (the replay-skip test
      // is head > base)
      def mark(sub: String, ids: Seq[Int]): Unit = {
        val d = new java.io.File(cfg.checkpointDir, sub); d.mkdirs()
        ids.foreach(i => java.nio.file.Files.write(
          d.toPath.resolve(i.toString), "v1".getBytes))
      }
      mark("offsets", Seq(0, 1, 2)); mark("commits", Seq(0, 1))
      val exPending = intercept[IllegalStateException](
        TriadPipeline.takedown(spark, cfg, Seq(102L).toDF("doc_id")))
      assert(exPending.getMessage.contains("pending replay") &&
        exPending.getMessage.contains("batch 2"), exPending.getMessage)
      mark("commits", Seq(2))
      // a takedown against a freshly-initialized pipeline (no batch
      // yet) is legal: the stores tombstone, the sinks have nothing to
      // remove from
      val cfg2 = cfgFor(s"$root/fresh")
      initStores(cfg2, corpus)
      val o2 = TriadPipeline.takedown(spark, cfg2, Seq(5L).toDF("doc_id"))
      assert(o2.minhashAcceptedVersion === None
        && o2.semanticAcceptedVersion === None)
      // the store tombstone is live: doc 5's content no longer rejects
      val o3 = TriadPipeline.processBatch(rows(
        (401L, uniq(5), base(5))), 0L, cfg2)
      assert(o3.dedup.accepted === 1L && o3.semantic.accepted === 1L)
    }
  }

  // ---- linkage tail stage ---------------------------------------------

  private def linkCfg(root: String): TriadPipeline.Config =
    cfgFor(root).copy(linkage =
      Some(TriadPipeline.LinkageStage("sig", Seq("blk"), maxDist = 2)))

  private def linkRows(rs: (Long, String, Array[Float], String)*): DataFrame =
    rs.map { case (id, text, vec, sig) => (id, text, vec, "b", sig) }
      .toDF("doc_id", "text", "embedding", "blk", "sig")

  private def sigLabels(cfg: TriadPipeline.Config): Map[String, String] =
    LinkageStore.labels(spark, cfg.linkageDir)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap

  test("linkage tail stage: survivors fold into the standing resolution, screen rejects never enter, labels equal the batch oracle") {
    withDir { root =>
      val cfg = linkCfg(root)
      initStores(cfg, rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*))
      assert(TriadPipeline.initLinkageStore(spark, cfg) === 0L)
      // batch 0: alpha1/alpha2 link (dist 1); gamma9 unlinked; 102 is a
      // text copy of corpus doc 3 — dies at the DEDUP screen, so its
      // unique sig must never reach the linkage state
      val o0 = TriadPipeline.processBatch(linkRows(
        (101L, uniq(101), base(101), "alpha1"),
        (102L, uniq(3), base(102), "zzzzz"),
        (103L, uniq(103), base(103), "alpha2"),
        (104L, uniq(104), base(104), "gamma9")), 0L, cfg)
      assert(o0.dedup.accepted === 3L && o0.semantic.accepted === 3L)
      assert(o0.linkage.map(_.version) === Some(1L))
      assert(sigLabels(cfg) ===
        Map("alpha1" -> "alpha1", "alpha2" -> "alpha1", "gamma9" -> "gamma9"))
      // batch 1: alpha3 joins the alpha cluster through alpha2; gamma8
      // links standing gamma9 and FLIPS its canonical (the relabel path)
      val o1 = TriadPipeline.processBatch(linkRows(
        (201L, uniq(201), base(201), "alpha3"),
        (202L, uniq(202), base(202), "gamma8")), 1L, cfg)
      assert(o1.linkage.map(_.version) === Some(2L))
      assert(sigLabels(cfg) === Map(
        "alpha1" -> "alpha1", "alpha2" -> "alpha1", "alpha3" -> "alpha1",
        "gamma9" -> "gamma8", "gamma8" -> "gamma8"))
      // the standing state answers exactly what the one-shot batch
      // operator answers over the ACCEPTED corpus (the store's contract,
      // here proven at the composition level)
      val accepted = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id", "blk", "sig")
      val viaStore = LinkageStore.resolveRows(spark, cfg.linkageDir, accepted)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaBatch = Dedup.resolveEntities(accepted, "sig", Seq("blk"), 2)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaStore === viaBatch)
    }
  }

  test("linkage takedown: sole-carrier values leave, shared values survive, state equals a fresh build over the survivors") {
    withDir { root =>
      val cfg = linkCfg(root)
      initStores(cfg, rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*))
      TriadPipeline.initLinkageStore(spark, cfg)
      // dup1 carried by 401 AND 402; solo7 only by 403; dup2 links dup1
      TriadPipeline.processBatch(linkRows(
        (401L, uniq(401), base(401), "dup1"),
        (402L, uniq(402), base(402), "dup1"),
        (403L, uniq(403), base(403), "solo7"),
        (404L, uniq(404), base(404), "dup2")), 0L, cfg)
      // a takedown touching NO sole-carrier value: dup1 stays carried by
      // 401, so nothing leaves the linkage state and the head stands
      val oShared = TriadPipeline.takedown(spark, cfg, Seq(402L).toDF("doc_id"))
      assert(oShared.linkageVersion === Some(1L))
      assert(sigLabels(cfg).keySet === Set("dup1", "dup2", "solo7"))
      val o = TriadPipeline.takedown(spark, cfg, Seq(403L).toDF("doc_id"))
      assert(o.linkageVersion === Some(2L))
      // solo7's sole carrier left → the value is withdrawn; dup1 is
      // still carried by 401 → the cluster stands
      assert(sigLabels(cfg) === Map("dup1" -> "dup1", "dup2" -> "dup1"))
      // the post-takedown state equals a fresh batch build over the
      // SURVIVING accepted corpus — the exactness the born-empty store
      // plus sink-as-carrier-of-record buys
      val survivors = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id", "blk", "sig")
      assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(401L, 404L))
      val viaStore = LinkageStore.resolveRows(spark, cfg.linkageDir, survivors)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaBatch = Dedup.resolveEntities(survivors, "sig", Seq("blk"), 2)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaStore === viaBatch)
    }
  }

  test("crash replay across the ivf→linkage boundary: committed stages skip, the linkage stage redoes, values enter once") {
    withDir { root =>
      val cfg = linkCfg(root)
      initStores(cfg, rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*))
      TriadPipeline.initLinkageStore(spark, cfg)
      TriadPipeline.processBatch(linkRows(
        (101L, uniq(101), base(101), "alpha1")), 0L, cfg)
      // batch 1 "crashes" after the ivf stage committed and before the
      // linkage stage ran: simulate by processing without the tail
      // stage configured (stages 1–3 run and ledger), then re-deliver
      // the batch to the FULL pipeline
      val b1 = linkRows((201L, uniq(201), base(201), "alpha2"))
      TriadPipeline.processBatch(b1, 1L, cfg.copy(linkage = None))
      val o1 = TriadPipeline.processBatch(b1, 1L, cfg)
      assert(o1.dedup.replay && o1.dedup.appendSkipped)
      assert(o1.semantic.replay && o1.semantic.appendSkipped)
      assert(o1.ivf.replay && o1.ivf.appendSkipped)
      assert(o1.linkage.exists(l => !l.replay && !l.appendSkipped))
      assert(sigLabels(cfg) === Map("alpha1" -> "alpha1", "alpha2" -> "alpha1"))
      // a SECOND replay: every stage, linkage included, skips its append
      val head = LinkageStore.latestVersion(spark, cfg.linkageDir)
      val o2 = TriadPipeline.processBatch(b1, 1L, cfg)
      assert(o2.linkage.exists(l => l.replay && l.appendSkipped))
      assert(LinkageStore.latestVersion(spark, cfg.linkageDir) === head)
      assert(sigLabels(cfg) === Map("alpha1" -> "alpha1", "alpha2" -> "alpha1"))
    }
  }

  test("takedown before any batch with the tail stage configured: the linkage half is a legal no-op") {
    withDir { root =>
      val cfg = linkCfg(root)
      initStores(cfg, rows((1L to 5L).map(i => (i, uniq(i), base(i.toInt))): _*))
      TriadPipeline.initLinkageStore(spark, cfg)
      val o = TriadPipeline.takedown(spark, cfg, Seq(3L).toDF("doc_id"))
      assert(o.linkageVersion === None && o.semanticAcceptedVersion === None)
    }
  }
}
