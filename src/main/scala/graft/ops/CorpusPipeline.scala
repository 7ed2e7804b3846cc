package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus cleaning pipeline — the composition
  * all the text/dedup operators exist for:
  *
  *   quality filter → exact dedup → verified MinHash near-dedup → clean
  *
  * Each stage is the scale-shaped operator from this package: the
  * quality filter is a narrow map, exact dedup shuffles content hashes,
  * near-dedup goes through LSH banding with exact-Jaccard verification
  * (so the output is deterministic — the near-dup stage equals an exact
  * Jaccard pair scan). Near-dup resolution keeps the lowest doc id of
  * each pair and drops the other side — the standard greedy rule (not
  * full connected components, which would need an iterative join;
  * documented trade-off, same as most production dedup pipelines;
  * [[Dedup.connectedComponents]] is the full-resolution alternative).
  *
  * Cost model: the pipeline itself triggers NO Spark actions unless the
  * caller opts in. The exact-dedup survivor frame is consumed by two
  * downstream branches (minhashVerifiedDups' shingle stage — grouped
  * banding since the self-join formulation was replaced — plus the
  * anti-join), and Spark re-runs a subplan's lineage once per
  * consuming branch — so the survivors are materialized exactly once:
  * to parquet when `materializeDir` is given (the 100 TB shape — a
  * checkpoint, not an executor-memory cache), else via an
  * [[OpCaches]]-registered cache (caller releases by wrapping the call
  * + materialization in [[OpCaches.scoped]], with a session-level
  * `spark.catalog.clearCache()`, or by passing a dir). Stage counts are
  * opt-in (`collectStats`) because each one is a full corpus scan the
  * common path should not pay.
  */
object CorpusPipeline {

  final case class CleanStats(input: Long, afterQuality: Long,
                              afterExact: Long, afterNear: Long)

  /** `maxGroupSize` is the embedded near-dedup's identical-content
    * valve ([[Dedup.DefaultMaxGroupSize]]); threading it here keeps the
    * composed entry point tunable. It guards the NEAR-dedup grouping
    * only — stage 2's exact dedup has already collapsed identical
    * content by then, so on this pipeline it can fire only for distinct
    * texts colliding on a shingle set or signature bucket. */
  def clean(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            minQuality: Double = 0.3, minTokens: Int = 10,
            shingleK: Int = 5, nearThreshold: Double = 0.9,
            collectStats: Boolean = false,
            materializeDir: Option[String] = None,
            maxGroupSize: Int = Dedup.DefaultMaxGroupSize): (DataFrame, Option[CleanStats]) = {
    // 1. quality floor (narrow map; pushdown-friendly)
    val qualified = docs.where(
      TextOps.qualityScore(col(textCol)) >= minQuality &&
        TextOps.tokenCount(col(textCol)) >= minTokens)

    // 2. exact dedup — keep the full first row per distinct content,
    // materialized once for the three downstream consumers
    val exact0 = Dedup.exactKeepFirst(qualified, textCol, idCol)
    val exact = materializeDir match {
      case Some(dir) =>
        exact0.write.mode("overwrite").parquet(dir)
        docs.sparkSession.read.parquet(dir)
      case None =>
        OpCaches.registered(exact0)
    }

    // 3. near-dedup — MinHash/LSH candidates exact-verified against the
    // true shingle Jaccard ([[Dedup.minhashVerifiedDups]]), drop the
    // higher id of every verified pair. Exact verification makes the
    // drop set — and hence the whole pipeline output — deterministic
    // and oracle-mirrorable. The drop-id set is cached (it is tiny:
    // bare ids of dropped docs) so the expensive LSH stage runs once
    // even when the stats count AND the caller's action both consume
    // the anti-join.
    val nearPairs = Dedup.minhashVerifiedDups(exact, idCol, textCol,
      shingleK = shingleK, threshold = nearThreshold,
      maxGroupSize = maxGroupSize)
    val dropIds = OpCaches.registered(
      nearPairs.select(col("id_b").as(idCol)).distinct())
    val cleaned = exact.join(dropIds, Seq(idCol), "left_anti")

    val stats =
      if (collectStats) {
        // survivors = exact − dropped: ids are unique per row, so the
        // anti-join count is derivable without executing the join
        val afterExact = exact.count()
        Some(CleanStats(docs.count(), qualified.count(),
          afterExact, afterExact - dropIds.count()))
      } else None
    (cleaned, stats)
  }
}
