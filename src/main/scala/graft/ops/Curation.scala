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
    // integral `div`, NOT floor(double /): past 2^53 cumulative tokens
    // the double quotient loses ulps and the shard index can land one
    // off while the long modulo stays exact — shard and shard_pos would
    // disagree. SQL div keeps the whole operator in 64-bit integers.
    require(!df.columns.contains("_pack_start"),
      "input carries a column named _pack_start — rename it first")
    df.withColumn("_pack_start", start.cast("long"))
      .withColumn("shard", expr(s"_pack_start div ${budgetTokens}L"))
      .withColumn("shard_pos", col("_pack_start") % budgetTokens)
      .drop("_pack_start")
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

  /** Proportional stratified sample: downsample to ~`total` rows while
    * preserving the stratum (language / source / quality-bucket)
    * distribution — the standard corpus-shrink that keeps a 100 TB
    * crawl's language mix intact. Complements [[Mix.stratifiedSample]]:
    * that one keeps an approximate per-stratum FRACTION (a per-row
    * Bernoulli-style bucket test, count varies with the data); this one
    * hits an exact total BUDGET with exact proportional allocation
    * (rank-based, count is a deterministic function of the stratum
    * sizes). Per-stratum quota is the exact
    * proportional share `floor(total · n_s / N)` (bounded below by 1 so
    * tiny strata stay represented), applied WITHOUT division: a row of
    * rank r survives iff `r == 1 or r · N <= total · n_s` — pure 64-bit
    * integer arithmetic, so every engine computes the identical sample.
    * (At corpora where `rank · N` could exceed 2⁶³ — N beyond ~10¹²
    * with million-row quotas — widen the comparison to decimal(38,0);
    * the driver corpus is 9 orders of magnitude below that.)
    *
    * Within a stratum, selection order is `md5(id)` (tie-break id): a
    * uniform deterministic permutation, i.e. the distributed equivalent
    * of reservoir sampling — membership is a pure function of the id,
    * so a document keeps or loses its slot reproducibly across runs and
    * partitionings, and the sample is unbiased w.r.t. any data order.
    *
    * Scale shape: the naive form is one window per stratum — but strata
    * are FEW (languages), so `partitionBy(stratum)` concentrates each
    * stratum's full mass in one task at 100 TB. Instead the rank runs in
    * two exact stages: (1) rank within (stratum, salt) over
    * `saltBuckets` hash-salted slices and keep each slice's local
    * top-quota — any row in the global stratum top-quota is necessarily
    * in its own slice's top-quota, so nothing that matters is lost;
    * (2) exact global rank per stratum over the ≤ saltBuckets · quota
    * survivors — quota-bounded mass, not corpus-bounded. The result is
    * bit-identical to the single-window form (spec-pinned), while the
    * heavy stage-1 windows are 1/saltBuckets of a stratum each and the
    * stage-2 window is small by construction. Quota stats come from one
    * tiny per-stratum count aggregate, broadcast back. */
  def proportionalSample(df: DataFrame, idCol: String, stratumCol: String,
                       total: Long, saltBuckets: Int = 16): DataFrame = {
    require(total > 0, s"sample budget must be positive: $total")
    // row_number() is IntegerType, so ranks — and therefore the budget —
    // cap at 2^31-1; refusing loudly beats silently truncating the
    // quota and breaking bit-parity with proportionalSampleDirect
    require(total <= Int.MaxValue,
      s"sample budget exceeds the 2^31-1 rank ceiling (row_number is " +
        s"IntegerType): $total")
    require(saltBuckets > 0, s"saltBuckets must be positive: $saltBuckets")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_ns"))
    val stats = counts.crossJoin(counts.agg(sum(col("_ns")).as("_nn")))
    // survives ⟺ rank·N ≤ total·n_s (exact integer floor-quota), rank 1 always
    def inQuota(rank: Column): Column =
      rank === 1 || rank * col("_nn") <= lit(total) * col("_ns")
    val key = md5(col(idCol).cast("string").cast("binary"))
    val salted = df
      .join(broadcast(stats), Seq(stratumCol))
      .withColumn("_key", key)
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(saltBuckets)))
    val w1 = Window.partitionBy(col(stratumCol), col("_salt"))
      .orderBy(col("_key"), col(idCol))
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(col("_key"), col(idCol))
    // the constant rank cap is semantically redundant (every stratum's
    // quota ≤ total, and the min-1 rank is ≤ total too) but load-bearing
    // for the plan: InferWindowGroupLimit only fires on rank <= LITERAL
    // conjuncts (it splits the And), pushing a WindowGroupLimit below
    // each exchange — every map task pre-prunes to its local top-`total`
    // before shuffling, so the shuffled mass is bounded by
    // partitions × total instead of the corpus (plan-spec-pinned)
    val cap = lit(total.toInt)
    salted
      .withColumn("_r1", row_number().over(w1))
      .where(col("_r1") <= cap && inQuota(col("_r1")))
      .withColumn("sample_rank", row_number().over(w2))
      .where(col("sample_rank") <= cap && inQuota(col("sample_rank")))
      .drop("_ns", "_nn", "_key", "_salt", "_r1")
  }

  /** 60-bit deterministic shuffle key from an id — the md5-hex-prefix
    * arithmetic [[graft.pipeline.Diff.contentChecksum]] already proved
    * cross-engine (15 lowercase hex chars parsed base-16; always
    * non-negative, fits a signed long). Training corpora are shuffled
    * by THIS, never by `rand()`: the order is a pure function of the
    * ids, so a re-run, a resumed export, or another engine reproduces
    * it bit-identically, and a grown corpus leaves the relative order
    * of old documents unchanged. */
  def shuffleKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Assign every row its shard (`shuffle_key % numShards`) and its
    * within-shard order key — one narrow projection, no shuffle; the
    * materialization is [[exportShards]]. */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.withColumn("shuffle_key", shuffleKey(col(idCol)))
      .withColumn("shard",
        pmod(col("shuffle_key"), lit(numShards.toLong)).cast("int"))
  }

  /** The pipeline's LAST MILE: materialize a curated corpus as
    * `numShards` deterministically shuffled training shards plus a
    * manifest the consumer can verify receipt against. Layout:
    * `outDir/data/shard=N/` (each shard co-located in one writer task —
    * the one shuffle here — and sorted by `(shuffle_key, id)`, so a
    * loader reading a shard's files in order sees the deterministic
    * training order) and `outDir/_manifest` (per shard: `n_rows` and
    * `key_checksum`, the order-invariant decimal sum of the shards'
    * shuffle keys — the [[graft.pipeline.Diff.contentChecksum]] class,
    * recomputable by ANY engine from the ids alone, which is what makes
    * a transfer verifiable without co-locating the bytes).
    *
    * The manifest is computed from the bytes just WRITTEN (re-read, not
    * the in-memory frame — the store-commit rationale), so it can never
    * describe anything but the shards it ships with. Scale shape: one
    * hash shuffle on `shard` + per-task sorts; the manifest aggregate
    * is shard-count rows. Refuses an empty corpus by name (an empty
    * export is a pipeline bug upstream, and an empty partitioned write
    * round-trips as an unreadable directory). Returns the manifest as
    * re-read from disk.
    *
    * Contract notes: a shard the hash assigns no rows gets NO directory
    * and NO manifest row (the manifest is the authority on what exists
    * — consumers iterate it, never `0..numShards`); ids need not be
    * unique or positive (duplicates share a key and both ship; the
    * count and checksum track them). The output directory is a plain
    * overwrite target, not a versioned store — one dataset version per
    * `outDir`, and concurrent exports to one `outDir` are the caller's
    * race to avoid. */
  def exportShards(df: DataFrame, idCol: String, numShards: Int,
                   outDir: String): DataFrame = {
    val spark = df.sparkSession
    require(!df.isEmpty,
      s"exportShards to $outDir: the corpus is empty — refusing to write " +
        "an empty shard set (an empty partitioned directory cannot even " +
        "be re-read; fix the upstream filter)")
    shardAssign(df, idCol, numShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(s"$outDir/data")
    val back = spark.read.parquet(s"$outDir/data")
    back.groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("shuffle_key").cast("decimal(20,0)")).cast("string")
          .as("key_checksum"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest")
  }

  /** Deterministic uniform in (0, 1] from an id: the 60-bit
    * [[shuffleKey]] mapped onto the unit interval. Pure function of
    * the id, and every step (integer +1, int→double, division) is an
    * IEEE-exact or correctly-rounded operation, so any engine computes
    * the identical double. */
  def hashUniform(id: Column): Column =
    (shuffleKey(id) + lit(1L)).cast("double") / lit(1152921504606846976.0d)

  /** Weighted sampling WITHOUT replacement, deterministic — the
    * importance-resampling primitive (pick `n` documents with
    * probability proportional to a quality/importance weight, e.g.
    * DSIR-style likelihood ratios) with the Efraimidis–Spirakis (2006)
    * key `u^(1/w)`: the `n` largest keys are exactly a weighted sample
    * without replacement, and with `u` derived from the id
    * ([[hashUniform]]) the "randomness" is a pure function of the data
    * — re-runs, other engines, and grown corpora agree on every
    * decision (a document's key never changes; only the cut line
    * moves).
    *
    * The key is quantized to DECIMAL(14,12) before ordering: `pow` is
    * the one step libms may disagree on by an ulp, and the quantization
    * collapses that below the orderable grid (the house decimal
    * pattern), with the id as the total tie-break. Rows with NULL or
    * non-positive weight are EXCLUDED — they have no defined sampling
    * probability, and silently treating them as tiny weights would let
    * a data bug sample them anyway.
    *
    * Scale shape: one narrow projection + a distributed top-n
    * (map-side per-partition top-n, merged driver-side — `n` must be
    * driver-sized, which a SAMPLE is; for rate-based thinning at
    * corpus scale use [[proportionalSample]]/[[Mix]] instead). Output:
    * the input columns plus `sample_key` (the quantized key), NOT
    * re-ordered by id — callers sort or [[exportShards]] as needed. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     n: Int): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    df.where(weight.isNotNull && weight > lit(0))
      .withColumn("sample_key",
        pow(hashUniform(col(idCol)), lit(1.0d) / weight.cast("double"))
          .cast("decimal(14,12)"))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
  }

  /** The RECEIPT side of [[exportShards]]: recompute the manifest from
    * the shard bytes actually present and compare against the shipped
    * manifest — what a consumer runs after a transfer (or an auditor
    * after an incident) before training on the shards. The found-side
    * checksum is recomputed as [[shuffleKey]] OF THE IDS — not read
    * from the stored `shuffle_key` column — so a shard whose ids were
    * altered fails verification even if the key column was left (or
    * forged) intact; rows where the stored key disagrees with the
    * recomputed one are additionally surfaced as `key_mismatches`
    * (0 on a clean shard, and a discrepancy when positive). Returns
    * ONLY the discrepancies (`shard`, manifest vs found rows and
    * checksums; a shard missing from either side shows as nulls on
    * that side) — empty means verified. Cost: one scan of the shards +
    * a shard-count join; the manifest side is shard-count rows. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
                   outDir: String, idCol: String): DataFrame = {
    val shipped = spark.read.parquet(s"$outDir/_manifest")
      .select(col("shard"), col("n_rows").as("manifest_rows"),
        col("key_checksum").as("manifest_checksum"))
    val recomputed = shuffleKey(col(idCol))
    val found = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("found_rows"),
        sum(recomputed.cast("decimal(20,0)")).cast("string")
          .as("found_checksum"),
        sum(when(col("shuffle_key") =!= recomputed, 1L).otherwise(0L))
          .as("key_mismatches"))
    shipped.join(found, Seq("shard"), "full_outer")
      .where(!(col("manifest_rows") <=> col("found_rows")) ||
        !(col("manifest_checksum") <=> col("found_checksum")) ||
        coalesce(col("key_mismatches"), lit(0L)) > 0)
  }

  /** [[verifyShards]] without the id column: checks COMPLETENESS only
    * (row counts and the stored-key checksum — a lost or truncated
    * shard is named), not id integrity; a shard whose ids were altered
    * with the stored `shuffle_key` column left intact still verifies
    * clean here. Prefer the `idCol` form whenever the id column's name
    * is known. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
                   outDir: String): DataFrame = {
    val shipped = spark.read.parquet(s"$outDir/_manifest")
      .select(col("shard"), col("n_rows").as("manifest_rows"),
        col("key_checksum").as("manifest_checksum"))
    val found = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("found_rows"),
        sum(col("shuffle_key").cast("decimal(20,0)")).cast("string")
          .as("found_checksum"))
    shipped.join(found, Seq("shard"), "full_outer")
      .where(!(col("manifest_rows") <=> col("found_rows")) ||
        !(col("manifest_checksum") <=> col("found_checksum")))
  }

  /** Single-window reference form of [[proportionalSample]] — the spec
    * pins the two-stage operator bit-identical to this. Not the scale
    * path (one window partition per stratum). */
  private[graft] def proportionalSampleDirect(df: DataFrame, idCol: String,
                                            stratumCol: String, total: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_ns"))
    val stats = counts.crossJoin(counts.agg(sum(col("_ns")).as("_nn")))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.join(broadcast(stats), Seq(stratumCol))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") === 1 ||
        col("sample_rank") * col("_nn") <= lit(total) * col("_ns"))
      .drop("_ns", "_nn")
  }
}
