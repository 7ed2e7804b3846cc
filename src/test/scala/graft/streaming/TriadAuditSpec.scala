package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.SparkSpec
import graft.ops.{IvfIndexStore, MinhashIndexStore, SemanticIndexStore}

/** Specs for [[TriadPipeline.audit]] — the read-only fsck across the
  * composed pipeline's surfaces. Each test breaks exactly one invariant
  * the composition promises and asserts the audit names it (and that a
  * healthy pipeline reads clean), pinning that the audit can actually
  * distinguish the failure modes its Scaladoc lists. */
class TriadAuditSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(i: Long): String =
    (0 until 12).map(w => s"w${i}x$w").mkString(" ")

  private def base(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)(rnd.nextFloat() * 2 - 1)
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

  /** Two healthy batches over a 20-doc standing corpus: every stage
    * accepts at least one row per batch, so both sinks hold live
    * directories for batches 0 and 1. */
  private def runHealthy(cfg: TriadPipeline.Config): Unit = {
    initStores(cfg, rows((1L to 20L).map(i => (i, uniq(i), base(i.toInt))): _*))
    TriadPipeline.processBatch(rows(
      (101L, uniq(101), base(101)), (104L, uniq(104), base(104))), 0L, cfg)
    TriadPipeline.processBatch(rows(
      (203L, uniq(203), base(203))), 1L, cfg)
  }

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("triad-audit").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def hadoopFs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  test("healthy pipeline audits clean, structurally and deep") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      val structural = TriadPipeline.audit(spark, cfg)
      assert(structural.ok, structural.toString)
      assert(structural.findings.forall(_.severity == "info"),
        s"a healthy pipeline carries no warnings: $structural")
      val deep = TriadPipeline.audit(spark, cfg, deep = true)
      assert(deep.ok, deep.toString)
    }
  }

  test("a cut store chain is an error naming the store") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // head is v=2 (init + two appends), v=0 is the full base — delete
      // the middle delta OUTSIDE the protocol
      assert(SemanticIndexStore.latestVersion(spark, cfg.semanticDir)
        .contains(2L))
      hadoopFs(root).delete(
        new org.apache.hadoop.fs.Path(s"${cfg.semanticDir}/v=1"), true)
      val report = TriadPipeline.audit(spark, cfg)
      assert(!report.ok)
      val hit = report.errors.filter(_.surface == "semantic store")
      assert(hit.nonEmpty && hit.exists(_.message.contains("v=1")),
        report.toString)
      // the other stores still read clean
      assert(report.errors.forall(_.surface == "semantic store"),
        report.toString)
    }
  }

  test("foreign owner stamp and a recreated checkpoint are errors") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // foreign owner: rewrite one store's stamp to another checkpoint
      val fs = hadoopFs(root)
      val marker = new org.apache.hadoop.fs.Path(
        s"${cfg.minhashDir}/_ingest_owner")
      val out = fs.create(marker, true)
      out.write("/somewhere/else\nnonce".getBytes("UTF-8")); out.close()
      val foreign = TriadPipeline.audit(spark, cfg)
      assert(foreign.errors.exists(f => f.surface == "minhash store" &&
        f.message.contains("/somewhere/else")), foreign.toString)
      // recreated checkpoint: the nonce file vanishes with the deleted
      // directory — every still-correctly-owned store must flag it
      fs.delete(new org.apache.hadoop.fs.Path(
        s"${cfg.checkpointDir}/_graft_ingest_nonce"), false)
      val recreated = TriadPipeline.audit(spark, cfg)
      Seq("semantic store", "ivf store").foreach { s =>
        assert(recreated.errors.exists(f => f.surface == s &&
          f.message.contains("nonce")), recreated.toString)
      }
    }
  }

  test("a downstream batch the upstream never committed is an error") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // forge a semantic-accepted directory for a batch the dedup stage
      // never ran (same schema: copy batch 1's bytes)
      val copy = spark.read.parquet(s"${cfg.semanticAccepted}/batch=1")
      copy.write.parquet(s"${cfg.semanticAccepted}/batch=99")
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.errors.exists(f => f.surface == "stage handoff" &&
        f.message.contains("99")), report.toString)
    }
  }

  test("stage-order ledger spread beyond the crash window is an error") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // forge a dedup ledger entry two batches ahead of the ivf head
      val fs = hadoopFs(root)
      val entry = new org.apache.hadoop.fs.Path(
        s"${cfg.minhashDir}/_ingest_ledger/b=3")
      val out = fs.create(entry, true)
      out.write("2".getBytes("UTF-8")); out.close()
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.errors.exists(f => f.surface == "stage order" &&
        f.message.contains("exceeds the one-batch crash window")),
        report.toString)
    }
  }

  test("an emptied upstream ledger beside populated downstream ledgers is a warn") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // externally empty the dedup ledger: the Some/Some ordering checks
      // would silently skip this pair — the audit must say it cannot
      // vouch for the ordering rather than stay quiet
      val fs = hadoopFs(root)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"${cfg.minhashDir}/_ingest_ledger"), true)
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.findings.exists(f => f.surface == "stage order" &&
        f.severity == "warn" &&
        f.message.contains("NO live ledger entries")), report.toString)
      assert(report.findings.exists(f => f.surface == "stage order" &&
        f.severity == "warn" && f.message.contains("spread check")),
        report.toString)
    }
  }

  test("a ledger base above the store head is an error") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      val fs = hadoopFs(root)
      val entry = new org.apache.hadoop.fs.Path(
        s"${cfg.ivfDir}/_ingest_ledger/b=1")
      val out = fs.create(entry, true)
      out.write("99".getBytes("UTF-8")); out.close()
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.errors.exists(f => f.surface == "ivf store" &&
        f.message.contains("regressed")), report.toString)
    }
  }

  test("a pending-replay checkpoint is reported as info, never an error") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      val fs = hadoopFs(root)
      Seq("offsets/0", "offsets/1", "commits/0").foreach { f =>
        val p = new org.apache.hadoop.fs.Path(s"${cfg.checkpointDir}/$f")
        val o = fs.create(p, true); o.write("{}".getBytes("UTF-8")); o.close()
      }
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.ok, report.toString)
      assert(report.findings.exists(f => f.surface == "checkpoint" &&
        f.severity == "info" && f.message.contains("batch 1")),
        report.toString)
    }
  }

  test("schema drift behind the accept-time check is an error naming the column and the tier") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // fold batches 0,1 → the archive becomes the schema authority
      assert(AcceptedSink.fold(spark, cfg.minhashAccepted,
        belowBatch = 2L) === Some(1L))
      assert(TriadPipeline.audit(spark, cfg).ok)
      // a LIVE directory written by an older writer without the check:
      // the accept-time refusal never saw it — only the audit can
      spark.read.parquet(s"${cfg.minhashAccepted}/_archive/v=0/data")
        .drop("batch")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .limit(1).write.parquet(s"${cfg.minhashAccepted}/batch=2")
      val live = TriadPipeline.audit(spark, cfg)
      assert(live.errors.exists(f => f.surface == "dedup accepted sink" &&
        f.message.contains("schema drift") && f.message.contains("lang") &&
        f.message.contains("live batch=2")), live.toString)
      hadoopFs(root).delete(new org.apache.hadoop.fs.Path(
        s"${cfg.minhashAccepted}/batch=2"), true)
      // an externally REWRITTEN archive version: fold a second
      // generation so v=1 is the newest full state and the head, then
      // doctor the NON-HEAD v=0's data (a doctored HEAD would become
      // the authority itself — the drift only shows across versions)
      spark.read.parquet(s"${cfg.minhashAccepted}/_archive/v=0/data")
        .drop("batch").limit(1)
        .write.parquet(s"${cfg.minhashAccepted}/batch=2")
      assert(AcceptedSink.fold(spark, cfg.minhashAccepted,
        belowBatch = 3L) === Some(2L))
      val v0 = s"${cfg.minhashAccepted}/_archive/v=0/data"
      val doctoredDf = spark.read.parquet(v0).drop("embedding")
      val doctored = doctoredDf.collect()
      val schema = doctoredDf.schema
      hadoopFs(root).delete(new org.apache.hadoop.fs.Path(v0), true)
      spark.createDataFrame(
        spark.sparkContext.parallelize(doctored.toIndexedSeq), schema)
        .coalesce(1).write.parquet(v0)
      val arch = TriadPipeline.audit(spark, cfg)
      assert(arch.errors.exists(f => f.surface == "dedup accepted sink" &&
        f.message.contains("schema drift") &&
        f.message.contains("embedding") &&
        f.message.contains("archive v=0")), arch.toString)
    }
  }

  test("deep audit catches a doctored stage handoff the structural pass cannot") {
    withDir { root =>
      val cfg = cfgFor(root)
      runHealthy(cfg)
      // splice one foreign row into semantic-accepted batch 1 by moving
      // a part-file in: the directory layout stays legal (structural
      // audit clean) but the row never passed stage 1
      val dir = s"${cfg.semanticAccepted}/batch=1"
      val tmp = s"$root/forge"
      spark.read.parquet(dir).limit(1)
        .withColumn("doc_id", org.apache.spark.sql.functions.lit(666L))
        .coalesce(1).write.parquet(tmp)
      val fs = hadoopFs(root)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/forged.parquet"))
      val structural = TriadPipeline.audit(spark, cfg)
      assert(structural.ok, structural.toString)
      val deep = TriadPipeline.audit(spark, cfg, deep = true)
      assert(deep.errors.exists(f => f.surface == "stage handoff" &&
        f.message.contains("666")), deep.toString)
    }
  }

  // ---- linkage tail stage ---------------------------------------------

  private def linkCfg(root: String): TriadPipeline.Config =
    cfgFor(root).copy(linkage =
      Some(TriadPipeline.LinkageStage("sig", Seq("blk"), maxDist = 2)))

  private def linkRows(rs: (Long, String, Array[Float], String)*): DataFrame =
    rs.map { case (id, text, vec, sig) => (id, text, vec, "b", sig) }
      .toDF("doc_id", "text", "embedding", "blk", "sig")

  private def runHealthyLinked(cfg: TriadPipeline.Config): Unit = {
    initStores(cfg, rows((1L to 20L).map(i => (i, uniq(i), base(i.toInt))): _*))
    TriadPipeline.initLinkageStore(spark, cfg)
    TriadPipeline.processBatch(linkRows(
      (101L, uniq(101), base(101), "alpha1"),
      (104L, uniq(104), base(104), "gamma9")), 0L, cfg)
    TriadPipeline.processBatch(linkRows(
      (203L, uniq(203), base(203), "alpha2")), 1L, cfg)
  }

  test("the linkage tail stage is a fourth audited surface: healthy is clean, uninitialized fails by name") {
    withDir { root =>
      val cfg = linkCfg(root)
      runHealthyLinked(cfg)
      val structural = TriadPipeline.audit(spark, cfg)
      assert(structural.ok, structural.toString)
      assert(structural.findings.forall(_.severity == "info"),
        structural.toString)
      val deep = TriadPipeline.audit(spark, cfg, deep = true)
      assert(deep.ok, deep.toString)
      // the SAME pipeline with the linkage store never initialized: the
      // audit must name the missing fourth store before a batch does
      val cfg2 = linkCfg(s"$root/fresh")
      initStores(cfg2, rows((1L to 5L).map(i => (i, uniq(i), base(i.toInt))): _*))
      val report = TriadPipeline.audit(spark, cfg2)
      assert(report.errors.exists(f => f.surface == "linkage store" &&
        f.message.contains("never initialized")), report.toString)
    }
  }

  test("deep audit catches an over-eager linkage value removal behind the composition's back") {
    withDir { root =>
      val cfg = linkCfg(root)
      runHealthyLinked(cfg)
      // a RAW store removal of a value surviving accepted rows still
      // carry — exactly the over-removal the composed takedown's
      // sole-carrier derivation exists to prevent; only the deep
      // containment proof can see it
      import graft.ops.LinkageStore
      val head = LinkageStore.latestVersion(spark, cfg.linkageDir).get
      LinkageStore.remove(spark, cfg.linkageDir,
        Seq(("b", "alpha1")).toDF("blk", "sig"), head)
      assert(TriadPipeline.audit(spark, cfg).ok)
      val deep = TriadPipeline.audit(spark, cfg, deep = true)
      assert(deep.errors.exists(f => f.surface == "linkage store" &&
        f.message.contains("alpha1")), deep.toString)
    }
  }

  test("a linkage ledger batch the ivf stage never committed is a stage-order error") {
    withDir { root =>
      val cfg = linkCfg(root)
      runHealthyLinked(cfg)
      val fs = hadoopFs(root)
      val entry = new org.apache.hadoop.fs.Path(
        s"${cfg.linkageDir}/_ingest_ledger/b=5")
      val out = fs.create(entry, true)
      out.write("2".getBytes("UTF-8")); out.close()
      val report = TriadPipeline.audit(spark, cfg)
      assert(report.errors.exists(f => f.surface == "stage order" &&
        f.message.contains("linkage store") && f.message.contains("5")),
        report.toString)
    }
  }
}
