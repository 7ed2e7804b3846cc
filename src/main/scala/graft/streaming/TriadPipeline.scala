package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The three ingest maintainers composed into ONE production pipeline
  * over ONE source stream — the natural training-data topology the
  * independent loops were built for:
  *
  *   source batch ──► [[DedupIngestStream]] (near-dup survivors vs the
  *   MinHash store) ──► [[SemanticIngestStream]] (semantic survivors vs
  *   the SemDeDup store, drift-gated) ──► [[IvfIngestStream]] (the
  *   retrieval index over everything that survived both screens).
  *
  * Each stage consumes the PREVIOUS stage's committed accepted bytes
  * for the same batch id (`acceptedDir/batch=<id>` — re-read from disk,
  * not the in-memory frame: the store-delta rationale, so a stage's
  * input can never drift from what its upstream actually committed),
  * and each stage keeps its OWN [[IngestProtocol]] ledger in its own
  * store. That per-stage ledgering is what makes a crash ANYWHERE in
  * the chain replay-safe with no coordinator: foreachBatch re-delivers
  * the batch, stages whose appends committed skip them (their ledger
  * shows head > base) while rewriting their deterministic accepted
  * output, and the first stage whose append was lost redoes it — the
  * boundary crash is just "every stage left of the crash skips, every
  * stage at/right of it redoes" (spec-pinned across a stage boundary,
  * `TriadPipelineSpec`).
  *
  * Scale shape: the composition adds NOTHING to the per-batch cost
  * model — each stage keeps its own O(batch) probe/append economics and
  * its own compaction cadence (minhash 8, vector stores 9 — the
  * measured knees), the inter-stage handoff is a survivor-mass parquet
  * read, and the accepted sinks fold on their own trips
  * ([[AcceptedSink]]). Input rows must carry BOTH the text and the
  * embedding column (the dedup stage passes every column through to its
  * survivors). Ids must be unique and never redelivered outside
  * checkpoint replay — the loops' shared source contract.
  *
  * An optional CURATION FRONT GATE ([[CurationGate]], `Config.curation`)
  * screens quality/tokens/language and redacts PII before stage 1 —
  * stateless, so it adds no ledger and no takedown surface (its
  * rejected audit keeps verdicts, never text). */
object TriadPipeline {

  /** Directory layout + knobs for one composed pipeline. `root` holds
    * `minhash-store`, `minhash-accepted`, `semantic-store`,
    * `semantic-accepted`, `ivf-store`. The three stores must be
    * init-ed over the standing corpus before the stream starts (each
    * loop refuses an uninitialized store by name).
    * `semanticThreshold` is explicit — no default — because a cosine
    * cut is a per-pipeline modeling choice ([[SemanticIngestStream]]'s
    * rationale). */
  final case class Config(root: String, idCol: String, textCol: String,
                          vecCol: String, checkpointDir: String,
                          minhashThreshold: Double = 0.5,
                          semanticThreshold: Double,
                          minhashCompactEvery: Int = 8,
                          vectorCompactEvery: Int = 9,
                          driftGateMinRows: Long = 16L,
                          curation: Option[CurationGate.Rule] = None) {
    def minhashDir: String = s"$root/minhash-store"
    def minhashAccepted: String = s"$root/minhash-accepted"
    def semanticDir: String = s"$root/semantic-store"
    def semanticAccepted: String = s"$root/semantic-accepted"
    def ivfDir: String = s"$root/ivf-store"
    def curationRejected: String = s"$root/curation-rejected"
  }

  /** What one composed micro-batch did, per stage. `curation` is None
    * when the pipeline runs without a front gate. */
  final case class TriadOutcome(dedup: DedupIngestStream.BatchOutcome,
                                semantic: SemanticIngestStream.BatchOutcome,
                                ivf: IvfIngestStream.BatchOutcome,
                                curation: Option[CurationGate.BatchOutcome] = None)

  /** One composed micro-batch — the three stages in sequence, each
    * reading its predecessor's committed accepted bytes for THIS batch
    * id. Factored out of the sink so specs can drive batch ids (and
    * crash-replay interleavings) deterministically. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  cfg: Config): TriadOutcome = {
    val spark = batch.sparkSession
    // the optional curation FRONT GATE ([[CurationGate]]): stateless and
    // deterministic, so its kept frame feeds stage 1 in memory (same
    // replay class as the source); only the text-free rejected audit
    // persists, under curationRejected/batch=<id>
    val (gated, o0) = cfg.curation match {
      case Some(rule) =>
        val (kept, oc) = CurationGate.processBatch(batch, batchId,
          cfg.curationRejected, cfg.idCol, cfg.textCol, rule)
        (kept, Some(oc))
      case None => (batch, None)
    }
    val o1 = DedupIngestStream.processBatch(gated, batchId,
      cfg.minhashDir, cfg.minhashAccepted, cfg.idCol, cfg.textCol,
      cfg.minhashThreshold, cfg.minhashCompactEvery, cfg.checkpointDir)
    // the dedup survivors carry every source column (embedding
    // included) — re-read from the committed batch directory, which a
    // fold can never touch (folds take strictly-below-current only)
    val survivors1 = spark.read.parquet(s"${cfg.minhashAccepted}/batch=$batchId")
    val o2 = SemanticIngestStream.processBatch(survivors1, batchId,
      cfg.semanticDir, cfg.semanticAccepted, cfg.idCol, cfg.vecCol,
      cfg.semanticThreshold, cfg.vectorCompactEvery, cfg.checkpointDir,
      cfg.driftGateMinRows)
    val survivors2 = spark.read.parquet(s"${cfg.semanticAccepted}/batch=$batchId")
    val o3 = IvfIngestStream.processBatch(survivors2, batchId,
      cfg.ivfDir, cfg.idCol, cfg.vecCol, cfg.vectorCompactEvery,
      cfg.checkpointDir, cfg.driftGateMinRows)
    TriadOutcome(o1, o2, o3, o0)
  }

  /** What [[takedown]] touched, per surface: the index stores' new
    * tombstone-delta versions and the accepted sinks' new archive
    * versions (None where a sink had nothing accepted yet). */
  final case class TakedownOutcome(minhashVersion: Long,
                                   semanticVersion: Long, ivfVersion: Long,
                                   minhashAcceptedVersion: Option[Long],
                                   semanticAcceptedVersion: Option[Long])

  /** TAKEDOWN across the whole pipeline — the one verb a training-data
    * platform owes its opt-out/contamination process: withdraw the
    * named ids from EVERY surface the pipeline maintains, each as an
    * O(tombstones) delta, never a corpus rewrite. Five writes:
    *
    *  - the three index stores ([[graft.ops.MinhashIndexStore.remove]]
    *    and friends) — so the withdrawn documents stop suppressing
    *    future near-dups and stop being retrievable;
    *  - the two accepted sinks ([[AcceptedSink.remove]]) — so the
    *    withdrawn documents stop being TRAINING DATA; their bytes
    *    leave disk at each sink's next archive compact.
    *
    * Note the dedup consequence, which is the CORRECT takedown
    * semantics: once removed from the index, a future arrival of the
    * same content (under a fresh id) is near-dup-free and will be
    * ACCEPTED — takedown means "as if never ingested", not "banned".
    * Keep a separate blocklist screen if banned-content semantics are
    * also needed. Concurrency: an out-of-band maintenance verb — each
    * store write names the head it read, so racing a live stream's
    * append fails loudly (the commit protocol); run between batches or
    * retry. Ids absent from a surface are a harmless no-op there (the
    * stores' unknown-id rule). */
  def takedown(spark: org.apache.spark.sql.SparkSession, cfg: Config,
               removeIds: DataFrame): TakedownOutcome = {
    import graft.ops.{IvfIndexStore, MinhashIndexStore, SemanticIndexStore}
    def headOf(latest: Option[Long], what: String): Long =
      latest.getOrElse(throw new IllegalStateException(
        s"triad takedown: $what has no committed version — the pipeline " +
          "was never initialized"))
    val mh = MinhashIndexStore.remove(spark, cfg.minhashDir, removeIds,
      cfg.idCol, headOf(MinhashIndexStore.latestVersion(spark, cfg.minhashDir),
        s"minhash store ${cfg.minhashDir}"))
    val sem = SemanticIndexStore.remove(spark, cfg.semanticDir, removeIds,
      cfg.idCol, headOf(SemanticIndexStore.latestVersion(spark, cfg.semanticDir),
        s"semantic store ${cfg.semanticDir}"))
    val ivf = IvfIndexStore.remove(spark, cfg.ivfDir, removeIds,
      cfg.idCol, headOf(IvfIndexStore.latestVersion(spark, cfg.ivfDir),
        s"ivf store ${cfg.ivfDir}"))
    // a sink with nothing accepted yet has nothing to remove from — a
    // takedown arriving before the first batch is legal. The check is
    // an explicit has-either-tier test, NOT a swallowed read attempt: a
    // corrupt archive must fail the takedown loudly, never silently
    // skip the data-product half of it
    def sinkRemove(dir: String): Option[Long] =
      if (!AcceptedSink.hasAccepted(spark, dir)) None
      else Some(AcceptedSink.remove(spark, dir, removeIds, cfg.idCol))
    TakedownOutcome(mh, sem, ivf,
      sinkRemove(cfg.minhashAccepted), sinkRemove(cfg.semanticAccepted))
  }

  /** What [[retrainVectorStores]] rebuilt: the corpus row count it
    * trained on (both stores re-init at v=0). */
  final case class RetrainOutcome(corpusRows: Long,
                                  semanticVersion: Long, ivfVersion: Long)

  /** RETRAIN the drift-gated vector stores from the accepted corpus —
    * the rebuild runbook (SCALE.md "Rebuild runbook") as one guarded
    * verb. This is the drift trigger's remedy: when `driftReport`
    * fires, the centroids no longer describe the corpus, and the fix
    * is an explicit delete-and-rebuild, never an append side effect
    * (the stores' own contract).
    *
    * Run it with the stream STOPPED. The runbook's safety check is
    * enforced, not advised: the verb refuses by name while the
    * checkpoint holds a batch pending replay
    * ([[IngestProtocol.pendingReplay]] — offsets ahead of commits),
    * because on resume that batch would fresh-record a ledger base
    * against the rebuilt store and re-append documents the rebuild
    * corpus already absorbed. Each vector store is deleted WHOLE (the
    * ingest ledger and owner stamp are per-store state and go with it)
    * and re-initialized over the CURRENT accepted corpus read through
    * the two-tier surface ([[AcceptedSink.readAccepted]] — folds and
    * takedowns are honored, so a withdrawn document does not sneak
    * back in through a retrain). The minhash store is untouched — text
    * dedup has no centroids to drift; a banding re-parameterization
    * follows the same recipe by hand. Resume the SAME checkpoint
    * afterwards: the next batch fresh-records its base against the new
    * v=0, and the absent owner stamp is benign (it only re-writes at
    * batch 0, which never recurs on a resumed checkpoint).
    *
    * `semanticNlist`/`ivfNlist` are explicit: a retrain is a
    * re-modeling event, and cell counts are sized to the CURRENT
    * corpus (the `semanticThreshold` explicitness rationale). */
  def retrainVectorStores(spark: org.apache.spark.sql.SparkSession,
                          cfg: Config, semanticNlist: Int = 0,
                          ivfNlist: Int = 16): RetrainOutcome = {
    import graft.ops.{IvfIndexStore, SemanticIndexStore}
    IngestProtocol.pendingReplay(spark, cfg.checkpointDir).foreach { b =>
      throw new IllegalStateException(
        s"triad retrain: checkpoint ${cfg.checkpointDir} holds batch $b " +
          "pending replay (offsets ahead of commits) — on resume it would " +
          "fresh-record a ledger base against the rebuilt store and " +
          "re-append documents the rebuild corpus already absorbed; let " +
          "the stream finish (or drain) the batch, then retrain")
    }
    val corpus = AcceptedSink.readAccepted(spark, cfg.semanticAccepted)
      .select(cfg.idCol, cfg.vecCol).cache()
    val rows = corpus.count()
    def wipe(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
    wipe(cfg.semanticDir)
    wipe(cfg.ivfDir)
    val sem = SemanticIndexStore.init(corpus, cfg.semanticDir,
      cfg.idCol, cfg.vecCol, nlist = semanticNlist)
    val ivf = IvfIndexStore.init(corpus, cfg.ivfDir,
      cfg.idCol, cfg.vecCol, nlist = ivfNlist)
    corpus.unpersist()
    RetrainOutcome(rows, sem, ivf)
  }

  /** Start the composed pipeline over a streaming frame. The final
    * accepted corpus (documents that survived BOTH screens) is
    * [[AcceptedSink.readAccepted]] over `cfg.semanticAccepted`; the
    * retrieval surface is [[graft.ops.IvfIndexStore.probeLatest]] over
    * `cfg.ivfDir`, readable concurrently at any committed version. */
  def triadSink(docs: DataFrame, cfg: Config): StreamingQuery = {
    require(cfg.minhashCompactEvery >= 1 && cfg.vectorCompactEvery >= 1,
      "compact cadences must be >= 1")
    docs.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
        (): Unit
      }
      .start()
  }
}
