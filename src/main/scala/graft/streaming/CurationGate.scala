package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The curation FRONT GATE of a streaming ingest pipeline: the cheap
  * per-document screens (emptiness, token floor, quality floor,
  * language allowlist) plus PII redaction, run BEFORE any stateful
  * stage — the production ordering, because every document the gate
  * drops is a document the dedup probe never hashes, the semantic
  * stage never scores, and the index never carries; and because
  * redaction must happen before signatures are computed (a signature
  * of unredacted text would leak through near-dup suppression).
  *
  * Unlike the three maintainers this stage is STATELESS — a pure
  * deterministic function of the micro-batch — so it needs no ledger,
  * no owner stamp and no store: on checkpoint replay it recomputes the
  * identical verdicts, the same replay class as the source itself. The
  * only thing it persists is the REJECTED AUDIT: one row per dropped
  * document under `rejectedDir/batch=<batchId>` carrying the id, the
  * first failing screen and the measured signals — deliberately NOT
  * the text. An audit that retained rejected content would be a fourth
  * takedown surface ([[TriadPipeline.takedown]]) and a second copy of
  * exactly the bytes most likely to be withdrawn; the verdict row is
  * the audit, the content stays only in the source. The write is
  * batch-directory overwrite, idempotent under replay like the
  * accepted sinks' ([[AcceptedSink]] lifecycle does not manage it —
  * audit rows are tiny and append-only by batch; archive or expire
  * them by retention policy).
  *
  * Scale shape: one narrow projection per document (token count,
  * quality score, language ID are all single-pass expressions), no
  * shuffle, no driver state — the gate adds O(batch · per-row-expr) to
  * the loop and nothing to its state economics. */
object CurationGate {

  /** The gate's policy. `allowedLangs` empty = no language screen;
    * `redactPii` scrubs email/phone/SSN spans from KEPT documents
    * ([[TextOps.redactPii]]) — rejection thresholds are evaluated on
    * the original text. */
  final case class Rule(minQuality: Double, minTokens: Long,
                        allowedLangs: Set[String] = Set.empty,
                        redactPii: Boolean = true)

  final case class BatchOutcome(batchId: Long, in: Long, kept: Long,
                                rejected: Long)

  /** First failing screen, in evaluation order; NULL = keep. The order
    * is contract (the audit's `reason` is the FIRST failure): empty →
    * tokens → quality → lang. */
  private def reasonCol(textCol: Column, rule: Rule): Column = {
    val langScreen: Column =
      if (rule.allowedLangs.isEmpty) lit(false)
      else !TextOps.languageId(textCol).isin(rule.allowedLangs.toSeq.sorted: _*)
    when(textCol.isNull || length(trim(textCol)) === 0, "empty")
      .when(TextOps.tokenCount(textCol) < rule.minTokens, "tokens")
      .when(TextOps.qualityScore(textCol) < rule.minQuality, "quality")
      .when(langScreen, "lang")
  }

  /** Split a batch into (kept, rejectedAudit). `kept` carries every
    * source column, text redacted if the rule says so; `rejectedAudit`
    * carries `(id, reason, n_tokens, quality, lang)` — no content. */
  def curate(batch: DataFrame, idCol: String, textCol: String,
             rule: Rule): (DataFrame, DataFrame) = {
    val txt = col(textCol)
    val judged = batch.withColumn("_cg_reason", reasonCol(txt, rule))
    val kept0 = judged.where(col("_cg_reason").isNull).drop("_cg_reason")
    val kept =
      if (rule.redactPii) kept0.withColumn(textCol, TextOps.redactPii(txt))
      else kept0
    val rejected = judged.where(col("_cg_reason").isNotNull)
      .select(col(idCol), col("_cg_reason").as("reason"),
        TextOps.tokenCount(txt).cast("long").as("n_tokens"),
        TextOps.qualityScore(txt).as("quality"),
        TextOps.languageId(txt).as("lang"))
    (kept, rejected)
  }

  /** One micro-batch through the gate: write the rejected audit for
    * this batch id (overwrite — replay rewrites identical bytes),
    * return the kept frame + counts. The kept frame feeds the next
    * stage IN MEMORY: it is a deterministic function of the source
    * batch, so it needs no committed handoff of its own — the first
    * STATEFUL stage's accepted sink is the pipeline's first commit. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  rejectedDir: String, idCol: String,
                                  textCol: String, rule: Rule): (DataFrame, BatchOutcome) = {
    val (kept, rejected) = curate(batch, idCol, textCol, rule)
    rejected
      .repartition(IngestProtocol.boundedFileCount(rejected.count()))
      .write.mode("overwrite").parquet(s"$rejectedDir/batch=$batchId")
    val nIn = batch.count()
    val nRej = batch.sparkSession.read
      .parquet(s"$rejectedDir/batch=$batchId").count()
    (kept, BatchOutcome(batchId, nIn, nIn - nRej, nRej))
  }
}
