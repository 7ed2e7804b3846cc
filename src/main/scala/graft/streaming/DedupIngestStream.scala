package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, when}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{MinhashIndexStore, OpCaches}

/** Streaming leg of the near-dup ingest pipeline — the production loop
  * the [[graft.ops.MinhashIndexStore]] protocol was built for, closed
  * end-to-end: per micro-batch, PROBE the arriving documents against
  * the standing corpus through the store's exchange-free banded path,
  * keep the survivors (batch docs that near-dup nothing standing and
  * nothing smaller-id in their own batch), APPEND them as an O(batch)
  * index delta, and run the scheduled maintenance — meta-only chain
  * polling every batch, the merged-mass health check and the O(corpus)
  * compact only when the measured cadence trips (SCALE.md "Chain-read
  * economics": ≤ `compactEvery` links holds the probe's chain tax
  * bounded).
  *
  * ==Survivor rule==
  * Deterministic, one pass, no iteration: a batch document is REJECTED
  * iff some verified near-dup pair links it to (a) any standing corpus
  * document — the standing copy wins regardless of id order — or
  * (b) a smaller-id document of its own batch (keep-first by id, the
  * same convention the batch dedup family uses). The rule is a greedy
  * under-approximation of connected components — a doc rejected
  * against an id that was itself rejected stays rejected (it is
  * near-dup of duplicate content) — which is what makes it one pass
  * and, crucially, REPLAY-STABLE (below). Ids must be unique within a
  * batch and across batches (the store's merged-corpora contract); a
  * re-sent identical document self-heals — its standing copy is in the
  * index, so the resend rejects as a corpus dup.
  *
  * ==Crash replay==
  * foreachBatch replays a batchId after failure, but the store append
  * is not idempotent (a second append of the same survivors would
  * violate id uniqueness), so each batch writes a LEDGER entry
  * (`indexDir/_ingest_ledger/b=<batchId>`, committed by atomic
  * rename BEFORE anything else) recording the index version the batch
  * saw as its base. On replay: latest > recorded base means the
  * append committed — skip it; latest == base means it didn't (or
  * no-op'd) — redo it, which is the store's own replay rule. The probe
  * and the accepted-output write always re-run (the output overwrite
  * is idempotent), and re-probing AFTER the append committed is
  * deterministic-identical: the survivors' own index copies carry the
  * survivors' ids, so every extra pair they admit folds onto a
  * within-batch pair the first probe already saw, and the survivor
  * rule resolves it the same way (spec-pinned,
  * `DedupIngestStreamSpec` "replay"). Ledger entries for batches below
  * the current one are replay-dead (foreachBatch delivers batch N only
  * after N−1's checkpoint commit) and are swept each batch, so the
  * ledger never holds more than two live entries.
  *
  * A fresh checkpoint pointed at a maintained store restarts batchIds
  * at 0 and would mis-read batch 0's stale ledger entry as its own
  * replay — the owner stamp (`_ingest_owner`, the
  * [[CdcStream]] pattern) binds the store to its checkpoint and
  * refuses the mismatch by name.
  *
  * ==What the loop cannot do to the index==
  * The loop's own appends can never grow a shingle-set group: two
  * documents share a group only at jaccard exactly 1.0, and an exact
  * copy is rejected before it reaches the index (its standing copy or
  * its smaller-id batch twin is already there). Merged-group valve
  * pressure ([[MinhashIndexStore.ChainHealth]]) can therefore only
  * come from the INIT corpus or an out-of-band maintainer — the health
  * check still guards every scheduled compact, and a chain whose
  * merged mass already exceeds the valve fails the batch by name
  * BEFORE the compact would discover it, leaving the chain intact.
  *
  * Scale shape: per micro-batch work is the banded probe (batch-mass
  * exchanges only, zero corpus-size shuffle term — plan-pinned), one
  * O(batch) delta append, one meta-only chain poll, and the accepted
  * write; the O(corpus) set-keyed merge runs only when the cadence
  * trips, amortized across `compactEvery` batches. Probe caches are
  * scope-released per batch ([[graft.ops.OpCaches]]), so a
  * long-running stream holds no cache growth. */
object DedupIngestStream {

  private val OwnerMarker = "_ingest_owner"
  private val LedgerDir = "_ingest_ledger"

  /** What one micro-batch did — returned by [[processBatch]] for
    * schedulers and specs; the streaming sink discards it. */
  final case class BatchOutcome(batchId: Long, base: Long, version: Long,
                                accepted: Long, replay: Boolean,
                                appendSkipped: Boolean,
                                compactedTo: Option[Long])

  private def fsPath(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  /** Write `dir/name` by scratch-write + one atomic rename — a partial
    * file can never appear under the final name, so a crash mid-write
    * leaves only reclaimable `.tmp` debris, never a corrupt marker. */
  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                          name: String, content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$name")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(
        s"dedup ingest: could not commit $dest (rename from scratch failed)")
  }

  /** One micro-batch of the ingest loop — factored out of the sink so
    * specs can drive batch ids (and replays) deterministically. See the
    * object doc for the protocol; returns what happened. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  indexDir: String, acceptedDir: String,
                                  idCol: String, textCol: String,
                                  threshold: Double, compactEvery: Int,
                                  checkpointDir: String): BatchOutcome = {
    val spark = batch.sparkSession
    val (fs, _) = fsPath(spark, indexDir)
    // batch 0 is where the ledger can't tell this stream's own crash
    // replay from a FRESH checkpoint pointed at a maintained store
    // (both arrive with batchId=0 and a possibly-standing ledger entry)
    // — the owner stamp decides, exactly the CdcStream rationale
    if (batchId == 0L) {
      val marker = new org.apache.hadoop.fs.Path(s"$indexDir/$OwnerMarker")
      readSmall(fs, marker) match {
        case Some(owner) =>
          require(owner == checkpointDir,
            s"index store $indexDir is ingested by checkpoint '$owner' but " +
              s"batch 0 arrived from checkpoint '$checkpointDir' — a fresh " +
              "checkpoint would mis-read the standing ingest ledger as its " +
              "own replays; resume the original checkpoint or point the new " +
              "stream at its own store")
        case None =>
          writeAtomic(fs, indexDir, OwnerMarker, checkpointDir)
      }
    }
    val head = MinhashIndexStore.latestVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"dedup ingest at $indexDir: no committed index version — " +
          "MinhashIndexStore.init the store over the standing corpus (an " +
          "empty frame is a legal corpus) before starting the stream"))
    val ledgerEntry = new org.apache.hadoop.fs.Path(
      s"$indexDir/$LedgerDir/b=$batchId")
    val recorded = readSmall(fs, ledgerEntry).map { s =>
      try s.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"dedup ingest at $indexDir: ledger entry $ledgerEntry holds " +
            s"'$s', not a version — the ledger is written by atomic rename, " +
            "so this is external corruption; repair or remove the entry")
      }
    }
    val (base, replay) = recorded match {
      case Some(b) =>
        require(head >= b,
          s"dedup ingest at $indexDir: ledger records base v=$b for batch " +
            s"$batchId but the latest committed version is v=$head — the " +
            "base regressed (pruned head or external rebuild?); the store " +
            "no longer matches this checkpoint's history")
        (b, true)
      case None =>
        // committed BEFORE the probe/append so the crash window between
        // "append committed" and "ledger written" cannot exist
        writeAtomic(fs, s"$indexDir/$LedgerDir", s"b=$batchId", head.toString)
        (head, false)
    }
    // replay with an advanced head means the append committed last time;
    // a same-head replay redoes it (the store's own replay rule)
    val appendCommitted = replay && head > base
    val outPath = s"$acceptedDir/batch=$batchId"
    // probe + survivor rule + accepted write, caches scope-released so
    // the long-running stream accumulates none
    OpCaches.scoped {
      val pairs = MinhashIndexStore
        .probeLatest(spark, indexDir, batch, idCol, textCol, threshold)
        .select("id_a", "id_b")
      val bids = OpCaches.registered(
        batch.select(col(idCol).as("bid")).distinct())
      // every probe pair touches the batch; a side absent from the batch
      // ids is standing corpus (or a survivor's index copy on replay —
      // which carries a BATCH id and lands in the within-batch branch)
      val flagged = pairs
        .join(broadcast(bids.select(col("bid").as("id_a"),
          lit(true).as("a_in"))), Seq("id_a"), "left")
        .join(broadcast(bids.select(col("bid").as("id_b"),
          lit(true).as("b_in"))), Seq("id_b"), "left")
      val rejected = flagged.select(
        when(col("a_in").isNull, col("id_b")) // corpus partner: batch doc loses
          .when(col("b_in").isNull, col("id_a"))
          .otherwise(col("id_b")) // both in batch: larger id loses
          .as(idCol))
        .distinct()
      batch.join(broadcast(rejected), Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(outPath)
    }
    // the delta is built from EXACTLY the bytes the accepted sink
    // carries — re-read, not the in-memory frame — so the index and the
    // accepted output can never drift (the commitVersion rationale)
    val acceptedOnDisk = spark.read.parquet(outPath)
    val version =
      if (appendCommitted) head
      else MinhashIndexStore.append(spark, indexDir, acceptedOnDisk,
        idCol, textCol, expectedBase = base)
    // maintenance: meta-only poll every batch; mass-reading health check
    // and the O(corpus) compact only when the cadence trips
    val compactedTo =
      if (MinhashIndexStore.chainLength(spark, indexDir) > compactEvery) {
        val health = MinhashIndexStore.chainHealth(spark, indexDir)
        if (health.groupValveExceeded)
          throw new IllegalStateException(
            s"dedup ingest at $indexDir: merged group mass " +
              s"${health.maxMergedGroup} exceeds the persisted " +
              s"maxGroupSize=${health.maxGroupSize} at chain length " +
              s"${health.chainLength} — the scheduled compact WILL fail " +
              "(the loop's own appends cannot grow a group, so this came " +
              "from the init corpus or an out-of-band append); split the " +
              "offending near-dup group or rebuild with a larger valve")
        val c = MinhashIndexStore.compact(spark, indexDir)
        MinhashIndexStore.prune(spark, indexDir, keepFrom = c)
        Some(c)
      } else None
    // ledger entries below this batch are replay-dead (batch N only
    // arrives after N-1's checkpoint commit) — sweep them
    val ledgerRoot = new org.apache.hadoop.fs.Path(s"$indexDir/$LedgerDir")
    if (fs.exists(ledgerRoot)) {
      val Entry = "b=(\\d+)".r
      fs.listStatus(ledgerRoot).foreach { st =>
        st.getPath.getName match {
          case Entry(b) if b.toLong < batchId => fs.delete(st.getPath, false)
          case _ => ()
        }
      }
    }
    BatchOutcome(batchId, base, version, acceptedOnDisk.count(), replay,
      appendCommitted, compactedTo)
  }

  /** Start the ingest maintainer: `docs` must be a streaming frame
    * carrying `idCol` and `textCol`; accepted (near-dup-free) documents
    * land under `acceptedDir/batch=<batchId>` — partition-style naming,
    * so `spark.read.parquet(acceptedDir)` reads the whole accepted
    * corpus with `batch` as a partition column. The index store at
    * `indexDir` must already be [[MinhashIndexStore.init]]-ed over the
    * standing corpus (an empty frame is a legal corpus); probes and
    * delta builds use the store's PERSISTED parameters, so the stream
    * cannot be mis-parameterized against the index it maintains.
    * `compactEvery` is the chain-length cadence — default 8, the
    * measured knee (SCALE.md "Chain-read economics"). The stream is
    * the store's single maintainer; do not run an external
    * compact/prune against a live stream (the commit protocol makes
    * the race fail loudly, not silently — but it fails the batch). */
  def dedupIngestSink(docs: DataFrame, indexDir: String, acceptedDir: String,
                      idCol: String, textCol: String, checkpointDir: String,
                      threshold: Double = 0.5,
                      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexDir, acceptedDir, idCol, textCol,
          threshold, compactEvery, checkpointDir)
        (): Unit
      }
      .start()
  }
}
