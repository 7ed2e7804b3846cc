package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, length, lit, transform, upper}
import graft.SparkSpec
import graft.ops.{Dedup, LinkageStore, MinhashIndexStore, SemanticIndexStore}

/** End-to-end specs for [[TriadPipeline.migrateCorpus]] — the
  * pipeline-level schema-migration runbook: both accepted sinks
  * rewritten by one transform, each derived store rebuilt exactly when
  * the CONTENT it was built over changed (not when the schema moved),
  * ingest resuming on the migrated shape, takedown still reaching every
  * surface — plus the migration-receipt coherence audit (a receipted
  * archive version whose footers no longer carry the declared schema
  * fails by name). */
class TriadMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(i: Long): String =
    (0 until 12).map(w => s"w${i}x$w").mkString(" ")

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
  }

  private def cfgFor(root: String): TriadPipeline.Config =
    TriadPipeline.Config(root, "doc_id", "text", "embedding",
      checkpointDir = s"$root/triad-cp", semanticThreshold = 0.9,
      linkage = Some(TriadPipeline.LinkageStage("sig", Seq("blk"),
        maxDist = 2)))

  private def rows(rs: (Long, String, Array[Float], String)*): DataFrame =
    rs.map { case (id, text, vec, sig) => (id, text, vec, "b", sig) }
      .toDF("doc_id", "text", "embedding", "blk", "sig")

  private def initAll(cfg: TriadPipeline.Config, corpus: DataFrame): Unit = {
    MinhashIndexStore.init(corpus, cfg.minhashDir, "doc_id", "text",
      shingleK = 5, numBands = 24, rowsPerBand = 2)
    SemanticIndexStore.init(corpus, cfg.semanticDir, "doc_id", "embedding",
      nlist = 4)
    graft.ops.IvfIndexStore.init(corpus, cfg.ivfDir, "doc_id", "embedding",
      nlist = 4)
    TriadPipeline.initLinkageStore(spark, cfg): Unit
  }

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("triad-mig").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def sigLabels(cfg: TriadPipeline.Config): Map[String, String] =
    LinkageStore.labels(spark, cfg.linkageDir)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap

  /** Two ingested batches over a fresh pipeline: survivors 101/103/104
    * (alpha1+alpha2 linked, gamma9 alone) then 201 (alpha3 joins). */
  private def seeded(root: String): TriadPipeline.Config = {
    val cfg = cfgFor(root)
    initAll(cfg, (1L to 10L).map(i => (i, uniq(i), base(i.toInt)))
      .toDF("doc_id", "text", "embedding"))
    TriadPipeline.processBatch(rows(
      (101L, uniq(101), base(101), "alpha1"),
      (103L, uniq(103), base(103), "alpha2"),
      (104L, uniq(104), base(104), "gamma9")), 0L, cfg)
    TriadPipeline.processBatch(rows(
      (201L, uniq(201), base(201), "alpha3")), 1L, cfg)
    cfg
  }

  test("pure ADD migration: both sinks rewritten, NO store rebuilds (content untouched), ingest resumes on the new shape, takedown reaches all five surfaces") {
    withDir { root =>
      val cfg = seeded(root)
      val mhHead = MinhashIndexStore.latestVersion(spark, cfg.minhashDir)
      val semHead = SemanticIndexStore.latestVersion(spark, cfg.semanticDir)
      val linkHead = LinkageStore.latestVersion(spark, cfg.linkageDir)
      val o = TriadPipeline.migrateCorpus(spark, cfg,
        _.withColumn("n_chars", length(col("text")).cast("long")),
        semanticNlist = 4, ivfNlist = 4)
      // both archives rewrote; every content checksum held, so every
      // derived store stands untouched at its pre-migration head
      assert(o.dedupMigration.nonEmpty && o.semanticMigration.nonEmpty)
      assert(!o.minhashRebuilt && o.vectorRetrain.isEmpty &&
        o.linkageRebuilt === Some(false))
      assert(MinhashIndexStore.latestVersion(spark, cfg.minhashDir) === mhHead)
      assert(SemanticIndexStore.latestVersion(spark, cfg.semanticDir) === semHead)
      assert(LinkageStore.latestVersion(spark, cfg.linkageDir) === linkHead)
      // the backfill landed across the whole history, batch pin intact
      val out = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id", "batch", "n_chars").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out.keySet === Set(101L, 103L, 104L, 201L))
      assert(out(201L)._1 === 1L)
      // the standing schema moved on BOTH sinks: the old batch shape is
      // refused by name, the migrated shape is accepted
      Seq(cfg.minhashAccepted, cfg.semanticAccepted).foreach { dir =>
        assert(AcceptedSink.acceptedSchema(spark, dir).get
          .fieldNames.contains("n_chars"))
        val msg = intercept[IllegalArgumentException](
          AcceptedSink.requireSchemaCompatible(spark, dir,
            rows((901L, uniq(901), base(901), "x")))).getMessage
        assert(msg.contains("DROPS") && msg.contains("n_chars"), msg)
      }
      // ingest resumes on the migrated shape — every stage, ledger
      // continuity included (no store was rebuilt)
      val b2 = rows((301L, uniq(301), base(301), "gamma8"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val o2 = TriadPipeline.processBatch(b2, 2L, cfg)
      assert(o2.dedup.accepted === 1L && o2.semantic.accepted === 1L)
      assert(o2.linkage.nonEmpty)
      // gamma8 relabels standing gamma9 — the standing resolution
      // carried straight across the migration
      assert(sigLabels(cfg).get("gamma9") === Some("gamma8"))
      // takedown still reaches all five surfaces: 104's sole-carrier
      // sig leaves the linkage state, the doc leaves both corpora
      val td = TriadPipeline.takedown(spark, cfg, Seq(104L).toDF("doc_id"))
      assert(td.linkageVersion.nonEmpty &&
        td.semanticAcceptedVersion.nonEmpty)
      assert(!sigLabels(cfg).contains("gamma9"))
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(101L, 103L, 201L, 301L))
      // and the platform audits clean end to end — receipts included
      val report = TriadPipeline.audit(spark, cfg, deep = true)
      assert(report.ok, report.toString)
    }
  }

  test("content rewrites force exactly the right rebuilds: text → minhash store, value keys → linkage store, embeddings → vector retrain") {
    withDir { root =>
      val cfg = seeded(root)
      // ONE migration rewriting text (uppercase) and the linkage value
      // column (suffix) while leaving embeddings bit-identical
      val o = TriadPipeline.migrateCorpus(spark, cfg,
        _.withColumn("text", upper(col("text")))
          .withColumn("sig", concat(col("sig"), lit("m"))),
        semanticNlist = 4, ivfNlist = 4)
      assert(o.minhashRebuilt, "text content changed — the sketches are stale")
      assert(o.linkageRebuilt === Some(true), "the key set moved")
      assert(o.vectorRetrain.isEmpty, "embeddings were untouched")
      // the rebuilt minhash store answers over MIGRATED content: a new
      // arrival carrying the migrated text of standing survivor 101
      // near-dup-rejects, proving the index was re-sketched (the
      // pre-migration sketches would never match uppercase shingles)
      val o2 = TriadPipeline.processBatch(rows(
        (401L, uniq(101).toUpperCase, base(401), "deltam")), 2L, cfg)
      assert(o2.dedup.accepted === 0L,
        "the migrated twin must reject against the re-sketched index")
      // the rebuilt linkage state answers exactly what a fresh batch
      // resolution over the MIGRATED accepted corpus answers
      assert(sigLabels(cfg) === Map(
        "alpha1m" -> "alpha1m", "alpha2m" -> "alpha1m",
        "alpha3m" -> "alpha1m", "gamma9m" -> "gamma9m"))
      val accepted = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id", "blk", "sig")
      val viaStore = LinkageStore.resolveRows(spark, cfg.linkageDir, accepted)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaBatch = Dedup.resolveEntities(accepted, "sig", Seq("blk"), 2)
        .select("doc_id", "canonical_sig").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaStore === viaBatch)
      // the born-empty doctrine survived the rebuild: takedown's
      // id→value derivation still withdraws a sole carrier exactly
      TriadPipeline.takedown(spark, cfg, Seq(104L).toDF("doc_id"))
      assert(!sigLabels(cfg).contains("gamma9m"))
      assert(TriadPipeline.audit(spark, cfg, deep = true).ok)
      // SECOND migration: rewrite embeddings only → vector retrain,
      // nothing else (checksums pin the other stores untouched)
      val mhHead = MinhashIndexStore.latestVersion(spark, cfg.minhashDir)
      val o3 = TriadPipeline.migrateCorpus(spark, cfg,
        _.withColumn("embedding",
          transform(col("embedding"), x => x * lit(2.0f))),
        semanticNlist = 4, ivfNlist = 4)
      assert(o3.vectorRetrain.nonEmpty && !o3.minhashRebuilt &&
        o3.linkageRebuilt === Some(false))
      assert(MinhashIndexStore.latestVersion(spark, cfg.minhashDir) === mhHead)
      // the retrained stores rebase on the accepted corpus (the
      // retrain doctrine — init-time standing docs drop out)
      assert(SemanticIndexStore.read(spark, cfg.semanticDir).cells
        .select(org.apache.spark.sql.functions.explode(col("ids")).as("id"))
        .collect().map(_.getLong(0)).toSet === Set(101L, 103L, 201L))
      assert(TriadPipeline.audit(spark, cfg, deep = true).ok)
    }
  }

  test("pre-flight refusals by name: dropped/retyped stage inputs, pending replay, empty pipeline — nothing is touched") {
    withDir { root =>
      val cfg = seeded(root)
      val heads = (MinhashIndexStore.latestVersion(spark, cfg.minhashDir),
        AcceptedSink.archiveChain(spark, cfg.semanticAccepted))
      def refused(mig: DataFrame => DataFrame): String =
        intercept[IllegalArgumentException](
          TriadPipeline.migrateCorpus(spark, cfg, mig)).getMessage
      val dropText = refused(_.drop("text"))
      assert(dropText.contains("DROPS") && dropText.contains("'text'") &&
        dropText.contains("dedup stage"), dropText)
      val retypeVec = refused(_.withColumn("embedding",
        col("embedding").cast("array<double>")))
      assert(retypeVec.contains("RETYPES") &&
        retypeVec.contains("'embedding'"), retypeVec)
      val dropSig = refused(_.drop("sig"))
      assert(dropSig.contains("'sig'") &&
        dropSig.contains("linkage tail stage"), dropSig)
      val retypeId = refused(_.withColumn("doc_id",
        col("doc_id").cast("int")))
      assert(retypeId.contains("'doc_id'"), retypeId)
      // a pending-replay checkpoint refuses before anything else runs
      def mark(sub: String, ids: Seq[Int]): Unit = {
        val d = new java.io.File(cfg.checkpointDir, sub); d.mkdirs()
        ids.foreach(i => java.nio.file.Files.write(
          d.toPath.resolve(i.toString), "v1".getBytes))
      }
      mark("offsets", Seq(0, 1, 2)); mark("commits", Seq(0, 1))
      val pending = intercept[IllegalStateException](
        TriadPipeline.migrateCorpus(spark, cfg,
          _.withColumn("z", lit(1L)))).getMessage
      assert(pending.contains("pending replay") &&
        pending.contains("batch 2"), pending)
      // every refusal left the platform serving its last good state
      assert((MinhashIndexStore.latestVersion(spark, cfg.minhashDir),
        AcceptedSink.archiveChain(spark, cfg.semanticAccepted)) === heads)
      // a pipeline with nothing accepted refuses: no schema to migrate
      val fresh = cfgFor(s"$root/fresh")
      initAll(fresh, (1L to 5L).map(i => (i, uniq(i), base(i.toInt)))
        .toDF("doc_id", "text", "embedding"))
      val msg = intercept[IllegalArgumentException](
        TriadPipeline.migrateCorpus(spark, fresh,
          _.withColumn("z", lit(1L)))).getMessage
      assert(msg.contains("neither accepted sink"), msg)
    }
  }

  test("migration-receipt audit: a receipted archive version whose footers no longer carry the declared schema fails by name") {
    withDir { root =>
      val cfg = seeded(root)
      val o = TriadPipeline.migrateCorpus(spark, cfg,
        _.withColumn("n_chars", length(col("text")).cast("long")),
        semanticNlist = 4, ivfNlist = 4)
      val v = o.semanticMigration.get.toVersion
      assert(AcceptedSink.receiptCoherenceFindings(
        spark, cfg.semanticAccepted).isEmpty)
      assert(TriadPipeline.audit(spark, cfg).ok)
      // doctor the receipt: swap the declared new schema for the OLD
      // one (guaranteed to disagree with the migrated footers) — the
      // external-rewrite class the standing-schema walk cannot see
      // when data and standing authority move together
      val receiptDir = s"${cfg.semanticAccepted}/_archive/v=$v/migration"
      val doctored = spark.read.parquet(receiptDir)
        .withColumn("new_schema", col("old_schema"))
        .collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(doctored.toIndexedSeq, 1),
        spark.read.parquet(receiptDir).schema)
        .write.mode("overwrite").parquet(receiptDir)
      val findings = AcceptedSink.receiptCoherenceFindings(
        spark, cfg.semanticAccepted)
      assert(findings.nonEmpty && findings.head.contains(s"v=$v") &&
        findings.head.contains("n_chars"), findings.mkString("; "))
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.errors.exists(f =>
        f.surface == "semantic accepted sink" &&
          f.message.contains("migration-receipt drift")), report.toString)
    }
  }
}
