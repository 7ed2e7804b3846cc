package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Graph, LinkGraph}

/** [[graft.ops.LinkGraph]] — the doc↔term bipartite graph that wires
  * PageRank to the corpus, and the rank-then-prune feedback loop over
  * the composed triad. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rs: (Long, String)*): DataFrame =
    rs.toDF("doc_id", "text")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("linkgraph").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("termEdges: distinct incidence in, shared terms (df ≥ 2) back, empty/null texts are isolates") {
    val e = LinkGraph.termEdges(docs(
      (1L, "spark  spark join"), (2L, "join merge"),
      (3L, ""), (4L, null.asInstanceOf[String])), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(e === Set(
      "d:1" -> "t:spark", "d:1" -> "t:join",
      "d:2" -> "t:join", "d:2" -> "t:merge",
      "t:join" -> "d:1", "t:join" -> "d:2"),
      "term frequency must not become link multiplicity; exclusive " +
        "terms (spark, merge) are dead ends; 3 and 4 contribute nothing")
  }

  test("docRank equals the unrolled pageRank over the same edges, bit for bit") {
    withDir { dir =>
      val d = docs((1L, "a b c"), (2L, "b c d"), (3L, "d e"), (4L, "zzz"))
      val viaDocRank = LinkGraph.docRank(d, "doc_id", "text",
        iters = 4, s"$dir/walk")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaUnrolled = Graph.pageRank(
        LinkGraph.termEdges(d, "doc_id", "text"), "src", "dst", iters = 4)
        .where(col("node").startsWith("d:"))
        .collect().map(r => r.getString(0).drop(2).toLong -> r.getDouble(1))
        .toMap
      assert(viaDocRank === viaUnrolled)
      assert(viaDocRank.keySet === Set(1L, 2L, 3L, 4L))
      // shared, well-connected vocabulary outranks an isolated token:
      // doc 2 touches b,c,d (each multi-doc) vs doc 4's lone zzz
      assert(viaDocRank(2L) > viaDocRank(4L))
    }
  }

  test("quality feedback loop over the composed triad: rank the accepted corpus, take down the tail, audit stays clean") {
    import graft.streaming.{AcceptedSink, TriadPipeline}
    import graft.ops.{IvfIndexStore, MinhashIndexStore, SemanticIndexStore}
    def uniq(i: Long): String = (0 until 12).map(w => s"w${i}x$w").mkString(" ")
    def base(i: Int): Array[Float] = {
      val rnd = new scala.util.Random(i)
      Array.fill(16)(rnd.nextFloat() * 2 - 1)
    }
    def rows(rs: (Long, String, Array[Float])*): DataFrame =
      rs.toDF("doc_id", "text", "embedding")
    withDir { root =>
      val cfg = TriadPipeline.Config(root, "doc_id", "text", "embedding",
        checkpointDir = s"$root/cp", semanticThreshold = 0.9)
      val corpus = rows((1L to 10L).map(i => (i, uniq(i), base(i.toInt))): _*)
      MinhashIndexStore.init(corpus, cfg.minhashDir, "doc_id", "text",
        shingleK = 5, numBands = 24, rowsPerBand = 2)
      SemanticIndexStore.init(corpus, cfg.semanticDir, "doc_id", "embedding",
        nlist = 4)
      IvfIndexStore.init(corpus, cfg.ivfDir, "doc_id", "embedding", nlist = 4)
      // 101/102 share vocabulary (well-linked); 103 is an isolate —
      // the rank tail by construction; 104 is TOKENLESS (no edges, no
      // rank — the rankless-exemption fixture). The ranked texts are
      // ≥ 5 tokens (the minhash shingle floor: a shorter text never
      // enters the index and the deep audit's accepted⊆index
      // containment would rightly flag it — 104 is withdrawn below
      // before the audit runs)
      TriadPipeline.processBatch(rows(
        (101L, "alpha beta gamma delta philo sophi", base(101)),
        (102L, "alpha beta gamma epsilon kata strophe", base(102)),
        (103L, "qqq www eee rrr ttt yyy", base(103)),
        (104L, "", base(104))), 0L, cfg)
      val ranks = TriadPipeline.qualityRank(spark, cfg,
        iters = 4, s"$root/walk0")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(ranks.keySet === Set(101L, 102L, 103L),
        "the tokenless doc produces no edges and gets no rank")
      assert(ranks(101L) > ranks(103L) && ranks(102L) > ranks(103L),
        s"the vocabulary isolate must rank last: $ranks")
      // floor chosen between the isolate and the pair (the explicit-
      // floor doctrine: read the distribution, then cut)
      val floor = (ranks(103L) + math.min(ranks(101L), ranks(102L))) / 2
      // the default tail honors the rankless exemption: 104 never
      // ranks below any floor, so only the isolate is selected
      val tail = TriadPipeline.qualityTail(spark, cfg,
        iters = 4, s"$root/walk0", rankFloor = floor)
      assert(tail.collect().map(_.getLong(0)).toSeq === Seq(103L))
      // includeRankless folds the exempt docs back in — the whole tail
      val tailAll = TriadPipeline.qualityTail(spark, cfg,
        iters = 4, s"$root/walk0", rankFloor = floor,
        includeRankless = true)
      assert(tailAll.collect().map(_.getLong(0)).toSet === Set(103L, 104L))
      // the tail feeds the standing takedown verb; the corpus shrinks
      // and every invariant the audit checks still holds
      TriadPipeline.takedown(spark, cfg, tailAll)
      assert(AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(101L, 102L))
      val report = TriadPipeline.audit(spark, cfg, deep = true)
      assert(report.ok, report.toString)
      // a re-rank over the post-takedown corpus never ranks the
      // withdrawn doc (fresh scratch: new corpus version, the resume
      // contract)
      val rr = TriadPipeline.qualityRank(spark, cfg,
        iters = 4, s"$root/walk1")
        .collect().map(_.getLong(0)).toSet
      assert(rr === Set(101L, 102L))
    }
  }

  test("corpus rank composes as a sampling weight: rank-weighted selection is deterministic and favors the core") {
    // the soft alternative to the hard qualityTail cut — the rank as a
    // DSIR-style importance weight into the deterministic weighted
    // sampler (Curation.weightedSample): high-rank docs dominate the
    // sample, nothing is hard-deleted, and the selection is replayable
    withDir { dir =>
      // 6 docs sharing a core vocabulary + 6 isolates
      val d = docs((1L to 12L).map { i =>
        i -> (if (i <= 6) s"alpha beta gamma d$i" else s"q$i w$i e$i r$i")
      }: _*)
      val ranks = LinkGraph.docRank(d, "doc_id", "text",
        iters = 4, s"$dir/walk")
      val picked = graft.ops.Curation.weightedSample(
        d.join(ranks, Seq("doc_id")), "doc_id", col("rank"), n = 4)
        .collect().map(_.getLong(0)).toSet
      assert(picked.forall(_ <= 6L),
        s"rank-weighted sampling must favor the shared-vocabulary core: $picked")
      val again = graft.ops.Curation.weightedSample(
        d.join(ranks, Seq("doc_id")), "doc_id", col("rank"), n = 4)
        .collect().map(_.getLong(0)).toSet
      assert(again === picked, "the weighted selection must be deterministic")
    }
  }
}
