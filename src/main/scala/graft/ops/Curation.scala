package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly: deterministic
  * dataset splits, per-domain volume caps, and fixed-token-budget
  * sequence packing — the steps between a cleaned corpus and a
  * tokenizer run.
  *
  * All three are deterministic functions of the data (no RNG state, no
  * timestamps): splits replay the salted [[Mix.bucket1000]] arithmetic,
  * caps and packing are rank/prefix-sum windows with total tie-break
  * orders — every engine with 64-bit integers and IEEE doubles computes
  * the identical result, which is what makes them oracle-checkable and
  * re-runnable on a growing corpus without reshuffling history.
  */
object Curation {

  /** Salt for the split decision — distinct from [[Mix.SampleSalt]] /
    * [[Mix.MixSalt]] so composing split with sampling or mixing on the
    * same key column keeps the decisions independent. */
  val SplitSalt = 3L

  /** Deterministic train/validation/test assignment from an integer key:
    * bucket < `trainPermille` → train, < `valPermille` → val, else test.
    * A narrow per-row decision — no shuffle, no RNG, stable across runs
    * and partitionings, and a document keeps its split when the corpus
    * around it changes (the property that prevents eval contamination
    * across dataset versions). */
  def splitAssign(df: DataFrame, key: Column,
                  trainPermille: Int = 900, valPermille: Int = 950): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= valPermille && valPermille <= 1000,
      s"need 0 <= train <= val <= 1000, got $trainPermille/$valPermille")
    val b = Mix.bucket1000(key, SplitSalt)
    df.withColumn("split",
      when(b < trainPermille, "train")
        .when(b < valPermille, "val")
        .otherwise("test"))
  }

  /** Per-domain volume cap: keep at most `n` rows per domain, best
    * first by `order` (callers must make it a TOTAL order — tie-break on
    * the id — or ranks are nondeterministic). The standard crawl-mix
    * guard against one domain flooding the corpus.
    *
    * Scale shape: one hash shuffle on the domain key + a per-domain
    * top-n window. A mega-domain makes that partition hot; since only
    * rank <= n survives, pre-filter each map partition to its local
    * top-n first when n is small (Spark's own WindowGroupLimit pushdown
    * does exactly this for rank filters — verify it fires in the plan). */
  def domainCap(df: DataFrame, domainCol: String, n: Int,
                order: Seq[Column]): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    df.withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= n)
  }

  /** Fixed-token-budget sequence packing (token-offset chunking): lay
    * the corpus out as one token stream per `groupCol` (concatenation
    * order = ascending `idCol`), then cut it every `budgetTokens` —
    * each document gets the shard index and in-shard offset where its
    * tokens start. This is the "concatenate then split at context-window
    * boundaries" packing used before tokenizer runs; documents may
    * straddle a boundary (the tokenizer's chunker handles the carry).
    *
    * Scale shape: a prefix sum per group — one shuffle keyed on the
    * group + a sorted window scan. Groups are pack domains (language,
    * source); a single giant group serializes its scan into one
    * partition, so at 100 TB pack within finer groups (e.g. lang ×
    * id-range) and offset shard indices per group — the two-phase
    * per-partition-partial-sums form of the same prefix sum. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    groupCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    // ROWS frame, not the default RANGE: RANGE sums over all ORDER BY
    // peers, so two rows sharing an id would each absorb the other's
    // tokens into its own start offset (overlapping layout). With ROWS,
    // duplicate ids still pack — their relative order is just
    // partition-dependent; keep idCol unique per group for stable output
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.withColumn("shard", floor(start / budgetTokens))
      .withColumn("shard_pos", start % budgetTokens)
  }

  /** Context-window chunking: split each document into token spans of
    * `maxTokens` with `overlap` tokens carried between consecutive
    * chunks — the per-DOCUMENT windowing step before packing (which
    * concatenates across documents; [[packSequences]]). Emits spans
    * (chunk_idx, tok_start, tok_end half-open), not substrings — at
    * corpus scale the caller slices text/token arrays from the spans
    * in the same projection that tokenizes, keeping this operator a
    * pure narrow map (explode of a per-row integer sequence; no
    * shuffle, no payload duplication).
    *
    * Chunk starts step by `maxTokens - overlap`; every token position
    * is covered, the last chunk may be short, and a document shorter
    * than `maxTokens` yields exactly one chunk. Zero-token documents
    * yield none. */
  def chunkSpans(df: DataFrame, idCol: String, tokensCol: String,
                 maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val step = maxTokens - overlap
    val n = col(tokensCol)
    df.where(n > 0)
      .select(col(idCol), n.as("_n"),
        posexplode(sequence(lit(0), n - 1, lit(step))).as(Seq("chunk_idx", "tok_start")))
      // a start inside the final overlap region would produce a chunk
      // fully contained in its predecessor — drop it (mirrors the
      // "last chunk may be short but never redundant" contract)
      .where(col("chunk_idx") === 0 || col("tok_start") + lit(overlap) < col("_n"))
      .select(col(idCol), col("chunk_idx"), col("tok_start"),
        least(col("tok_start") + maxTokens, col("_n")).as("tok_end"))
  }
}
