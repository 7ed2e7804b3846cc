package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus cleaning pipeline — the composition
  * all the text/dedup operators exist for:
  *
  *   quality filter → exact dedup → MinHash near-dedup → clean corpus
  *
  * Each stage is the scale-shaped operator from this package: the
  * quality filter is a narrow map, exact dedup shuffles content hashes,
  * near-dedup goes through LSH banding. Near-dup resolution keeps the
  * lowest doc id of each pair and drops the other side — the standard
  * greedy rule (not full connected components, which would need an
  * iterative join; documented trade-off, same as most production
  * dedup pipelines).
  */
object CorpusPipeline {

  final case class CleanStats(input: Long, afterQuality: Long,
                              afterExact: Long, afterNear: Long)

  def clean(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            minQuality: Double = 0.3, minTokens: Int = 10,
            shingleK: Int = 5, nearThreshold: Double = 0.9): (DataFrame, CleanStats) = {
    val input = docs.count()

    // 1. quality floor (narrow map; pushdown-friendly)
    val qualified = docs.where(
      TextOps.qualityScore(col(textCol)) >= minQuality &&
        TextOps.tokenCount(col(textCol)) >= minTokens)
    val afterQuality = qualified.count()

    // 2. exact dedup — keep the full first row per distinct content
    val exact = Dedup.exactKeepFirst(qualified, textCol, idCol).cache()
    val afterExact = exact.count()

    // 3. near-dedup — MinHash/LSH candidates, drop the higher id of
    // every surviving near-dup pair
    val nearPairs = Dedup.minhashNearDups(exact, idCol, textCol,
      shingleK = shingleK, threshold = nearThreshold)
    val dropIds = nearPairs.select(col("id_b").as(idCol)).distinct()
    // cached: the stats count below already executes the expensive
    // near-dedup stage — callers consuming the returned frame must not
    // pay for it twice
    val cleaned = exact.join(dropIds, Seq(idCol), "left_anti").cache()
    val afterNear = cleaned.count()

    (cleaned, CleanStats(input, afterQuality, afterExact, afterNear))
  }
}
