package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Per-row narrow transforms with no shuffle, so they scale linearly at
  * 100 TB. The token/char-class counting primitives run on the native
  * [[graft.functions.TokenStopCounts]] / [[graft.functions.AsciiClassCounts]]
  * kernels (single byte pass, whole-stage codegen) — their composed
  * builtin forms (kept below as `*Composed` parity references) paid an
  * interpreted higher-order `filter` per token plus a `regexp_replace`
  * document rewrite per ratio, which made the corpus quality scan the
  * hottest per-row stage in the engine once the noop-sink bench measured
  * it honestly (50.4 s on the 100× corpus). All double arithmetic is
  * unchanged on top of integer counts, so results are bit-identical to
  * the composed forms (property-pinned in both codegen modes, and
  * hash-checked by the DuckDB oracle).
  */
object TextOps {
  import graft.functions.TextStatFunctions.{ascii_class_counts, token_stop_counts}

  /** Whitespace token count — maximal non-whitespace runs, i.e. REAL
    * tokens: "" and "\t" count 0, "foo\n" counts 1. (The pre-r12 form
    * mirrored Java split(-1)'s phantom empty tokens, which read every
    * newline-terminated document one token high — an off-by-one on the
    * quality gates for essentially all real web text.) */
  def tokenCount(textCol: Column): Column =
    token_stop_counts(textCol, Nil).getField("tokens")

  private[graft] def tokenCountComposed(textCol: Column): Column =
    size(filter(split(textCol, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword token estimate: word-pieces + digits + punctuation
    * as separate tokens (regex analogous to common BPE pre-tokenizers). */
  def bpeishTokenCount(textCol: Column): Column = {
    val c = ascii_class_counts(textCol)
    c.getField("alpha_runs") + c.getField("digit") + c.getField("punct")
  }

  private[graft] def bpeishTokenCountComposed(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character-class ratios used for quality scoring. */
  def punctRatio(textCol: Column): Column =
    ascii_class_counts(textCol).getField("punct")
      .cast("double") / greatest(length(textCol), lit(1)).cast("double")

  private[graft] def punctRatioComposed(textCol: Column): Column =
    (length(textCol) - length(regexp_replace(textCol, "[^A-Za-z0-9\\s]", "")))
      .cast("double") / greatest(length(textCol), lit(1)).cast("double")

  def digitRatio(textCol: Column): Column =
    ascii_class_counts(textCol).getField("digit")
      .cast("double") / greatest(length(textCol), lit(1)).cast("double")

  private[graft] def digitRatioComposed(textCol: Column): Column =
    (length(textCol) - length(regexp_replace(textCol, "[0-9]", "")))
      .cast("double") / greatest(length(textCol), lit(1)).cast("double")

  /** Ratio of tokens that are in a stopword list (English-ish default).
    * The denominator is the REAL token count ([[tokenCount]] semantics),
    * so ratios are not diluted by the old phantom empties. */
  def stopwordRatio(textCol: Column,
                    stopwords: Seq[String] = defaultStopwords): Column = {
    val st = token_stop_counts(lower(textCol), stopwords)
    st.getField("stop_hits").cast("double") /
      greatest(st.getField("tokens"), lit(1)).cast("double")
  }

  private[graft] def stopwordRatioComposed(textCol: Column,
                    stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = filter(split(lower(textCol), "\\s+"), t => length(t) > 0)
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** BM25 defaults (Okapi's standard values) — named so the generated
    * oracle SQL interpolates the SAME doubles the operator folds with
    * (Double.toString round-trips, so both engines parse the exact
    * bits). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Composite quality score in [0,1]: long-enough, low punctuation noise,
    * some stopwords (prose-likeness). Deterministic closed form; left
    * unrounded — decimal rounding of a double can land on a tie and
    * engines break ties differently, while the raw arithmetic is
    * bit-reproducible. */
  def qualityScore(textCol: Column): Column = {
    val lenScore = least(length(textCol).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(textCol) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(textCol) * 5.0, lit(1.0))
    lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3
  }

  /** Character n-gram based language ID heuristic: scores text against
    * per-language marker n-gram lists, returns argmax language code.
    * A real system would load trained n-gram profiles; the mechanism —
    * per-language score columns + greatest/choose — is the scalable part
    * (single narrow projection, no shuffle). */
  /** Marker n-gram profiles per language — shared by [[languageId]] and
    * the generated oracle SQL so both derive from one source of truth. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", "ing "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", "sch"),
    "fr" -> Seq(" le ", " les ", " des ", " est ", " une "),
    "es" -> Seq(" el ", " los ", " que ", " una ", "ción"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def languageId(textCol: Column): Column = {
    val t = concat(lit(" "), lower(textCol), lit(" "))
    val scores = langProfiles.map { case (lang, grams) =>
      // literal `replace` (plain byte search), not regexp_replace of the
      // quoted gram: same non-overlapping occurrence count — it is the
      // exact formula the DuckDB oracle runs — at ~1/5 the cost of 25
      // regex scans per row (measured 4.8 → 0.9 s on the sf0.1 sweep)
      val s = grams.map(g =>
        (length(t) - length(replace(t, lit(g), lit(""))))
          / lit(g.length)).reduce(_ + _)
      struct(s.cast("long").as("score"), lit(lang).as("lang"))
    }
    // argmax by (score, lang) — greatest on structs compares fieldwise,
    // so score ties break to the alphabetically-greatest language code
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint (winnowing-style): hash every
    * k-shingle, keep the minimum w consecutive-window hashes' minima as a
    * compact fingerprint set. Here simplified to the n smallest shingle
    * hashes (bottom-k sketch) — set-resemblance preserving, deterministic.
    *
    * Evaluated by the native [[graft.functions.ShingleFingerprint]]
    * kernel — bit-identical to the composed
    * `slice(array_sort(array_distinct(transform(Dedup.shingles(text, k),
    * xxhash64))), 1, n)` form (equivalence property spec), which as an
    * interpreted HOF tree measured ~600 µs/doc at sf0.1 — the whole
    * query dropped 15× (8.0 → 0.53 s) when it went native. */
  def fingerprint(textCol: Column, k: Int = 5, n: Int = 8): Column =
    graft.functions.TextHashFunctions.shingle_fingerprint(textCol, k, n)

  /** Repetition quality signals (the Gopher/RefinedWeb-style filters
    * adapted to token streams): per document,
    *  - `top_ngram_frac`  — occurrences of the most frequent `topN`-gram
    *    over total `topN`-gram occurrences (boilerplate/loop detector);
    *  - `dup_ngram_frac`  — fraction of `dupN`-gram occurrences that are
    *    repeats of an earlier one (1 − distinct/total).
    * Documents shorter than the n-gram width score 0 on that signal.
    *
    * Scale shape: n-grams are EXPLODED to rows and counted with one hash
    * aggregate per signal — never collected per-row into a frequency map
    * (a per-doc HOF mode-count would be O(grams²) per document and fall
    * out of codegen for long docs). Shuffles carry 8-byte gram hashes,
    * not gram strings ([[Dedup.shingleHashed]]); map-side partial
    * aggregation keeps the shuffle at one row per (doc, distinct gram).
    * Only count/fraction columns are emitted — no mode-gram string — so
    * results are tie-break-free and engine-portable. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      topN: Int = 2, dupN: Int = 3): DataFrame = {
    val ids = df.select(col(idCol).as("id"))
    def gramCounts(n: Int) =
      Dedup.shingleHashed(df, idCol, textCol, n)
        .select(col("id"), explode(col("shh")).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("cnt"))
    val top = gramCounts(topN)
      .groupBy("id")
      .agg(sum(col("cnt")).as("total_top"), max(col("cnt")).as("max_top"))
    val dup = gramCounts(dupN)
      .groupBy("id")
      .agg(sum(col("cnt")).as("total_dup"), count(lit(1)).as("distinct_dup"))
    ids
      .join(top, Seq("id"), "left")
      .join(dup, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("total_top"), lit(0L)).as("n_top_grams"),
        coalesce(col("max_top").cast("double") / col("total_top"), lit(0.0))
          .as("top_ngram_frac"),
        coalesce(col("total_dup"), lit(0L)).as("n_dup_grams"),
        coalesce((col("total_dup") - col("distinct_dup")).cast("double") / col("total_dup"),
          lit(0.0)).as("dup_ngram_frac"))
  }

  /** PII patterns shared by [[redactPii]] and the oracle SQL — plain
    * character-class regexes that mean the same thing in Java regex
    * (Spark) and RE2 (DuckDB). Order matters only for overlapping
    * shapes; these are disjoint. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "<SSN>",
    "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b" -> "<PHONE>")

  /** PII redaction: replace email / SSN-shaped / phone-shaped spans with
    * typed placeholders. A narrow codegen'd regexp_replace chain — no
    * shuffle, linear scan, the standard pre-training scrub pass. */
  def redactPii(textCol: Column): Column =
    piiPatterns.foldLeft(textCol) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Count of PII spans a redaction pass would replace. Each pattern is
    * counted on the text AFTER the preceding patterns were replaced —
    * exactly the spans [[redactPii]]'s sequential replace consumes — so
    * one span can never be double-counted (an SSN embedded in an email
    * local-part is gone by the time the SSN pattern runs). */
  def piiCount(textCol: Column): Column =
    piiPatterns.foldLeft((lit(0), textCol)) { case ((n, txt), (pat, repl)) =>
      (n + regexp_count(txt, lit(pat)), regexp_replace(txt, pat, repl))
    }._1

  /** Unigram-rarity quality score: mean reciprocal unigram probability
    * of a document's tokens against the corpus unigram distribution —
    * the surprisal-proxy used to flag gibberish (high rarity) and
    * boilerplate (low rarity). Reciprocal probability (corpus_total /
    * token_freq) is used instead of log-surprisal deliberately: a single
    * IEEE division is bit-identical across engines, while libm log
    * implementations differ in the last ulp and would break exact oracle
    * comparison. Per-doc means go through DECIMAL(28,10) partial sums so
    * results are partition-order-independent.
    *
    * Scale shape: one aggregate builds the vocabulary-sized frequency
    * table; the probe is an equi-join on the token (broadcast when the
    * vocabulary is dimension-sized — AQE decides); one hash aggregate
    * per document closes it. Nothing quadratic, no driver loops. */
  def unigramRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // cached: feeds the freq aggregate AND the probe side of the scored
    // join (freq itself re-derives for `total`) — without the cache one
    // action runs the corpus tokenize+explode three times, the
    // plan-branch recompute trap bm25/bigramLmScores cache against
    val toks = OpCaches.registered(df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(col("tok") =!= ""))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).as("corpus_total"))
    val scored = toks.join(freq, Seq("tok")).crossJoin(total)
      .select(col("id"),
        (col("corpus_total").cast("double") / col("freq").cast("double")).as("rarity"))
    df.select(col(idCol).as("id"))
      .join(
        scored.groupBy("id").agg(
          count(lit(1)).as("n_tokens"),
          (sum(col("rarity").cast("decimal(28,10)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_rarity")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_rarity"), lit(0.0)).as("avg_rarity"))
  }

  /** Corpus-level line deduplication (the CCNet/RefinedWeb boilerplate
    * pass): a line appearing in more than `maxDocFrac` of all documents
    * is boilerplate (nav headers, footers, cookie banners) and is
    * dropped from every document; surviving lines are reassembled in
    * their original order. Documents whose every line is boilerplate
    * come back with empty text, not missing rows.
    *
    * Scale shape: explode to (doc, line_no, line) rows, one aggregate
    * for per-line document frequency, an equi-join to filter, one
    * aggregate to reassemble. The join here keys on the line STRING so
    * the SQL oracle can replay it; at 100 TB key the frequency join on
    * xxhash64(line) instead and carry the string only on the
    * reassembly path (the [[Dedup.shingleHashed]] trade — shuffles
    * 8-byte hashes, not text). The doc-count is a 1-row frame consumed
    * via crossJoin, so nothing is eager at construction. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                maxDocFrac: Double = 0.5): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1, s"maxDocFrac out of (0,1]: $maxDocFrac")
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    val docFreq = lines.groupBy("line").agg(countDistinct(col("id")).as("line_df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    // EMPTY lines are exempt: a blank line is paragraph structure, not
    // boilerplate, and nearly every multi-paragraph document contains
    // one — frequency-dropping it would strip the separators from the
    // whole corpus the moment blank lines cross maxDocFrac (CCNet-style
    // passes likewise exclude empty lines from the frequency count)
    val kept = lines.join(docFreq, Seq("line")).crossJoin(total)
      .where(col("line") === "" ||
        col("line_df") <= col("n_docs") * maxDocFrac)
    val rebuilt = kept.groupBy("id").agg(
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line"))).as("clean_text"),
      count(lit(1)).as("n_lines_kept"))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  /** Benchmark-contamination scan: per document, how many of its
    * distinct k-token shingles also occur anywhere in a benchmark
    * corpus (the standard train/eval overlap check before training).
    *
    * Scale shape: both sides reduce to distinct 8-byte shingle hashes;
    * the probe is a left-semi-join-shaped equi-join on the hash (the
    * benchmark side is globally deduped first, so its size is bounded by
    * its vocabulary, not its row count — dimension-sized benchmarks
    * broadcast under AQE). Nothing ever shuffles document text. */
  /** BM25 relevance scores for a fixed query-term set over the corpus —
    * the retrieval-scoring primitive behind decontamination search,
    * targeted corpus slicing ("all docs about X"), and quality-weighted
    * sampling. Output: one row per document with `n_tokens` and `bm25`.
    *
    * Determinism deviation, mirrored in the oracle: idf is the
    * Robertson–Spärck-Jones RATIO `(N - df + 0.5) / (df + 0.5)` without
    * the usual `ln` — the ranking is order-equivalent per term, and
    * dropping the log keeps every operation IEEE-exact (+ − × ÷ are
    * bit-defined; libm `log` is correctly-rounded on neither engine, so
    * a logged idf could differ in the last ulp between Spark and
    * DuckDB). The per-term sum runs in the FIXED order of `queryTerms`
    * (an expression left-fold, not an aggregation), so scores are
    * bit-reproducible across engines and partitionings.
    *
    * Scale shape: zero shuffles on the corpus. Per-term tf comes from
    * the native [[graft.functions.TokenStopCounts]] kernel with a
    * single-term list — one byte pass per (row, term), no token
    * explode, no (doc, token) shuffle. The corpus-level stats (N,
    * per-term df, Σdl) reduce in ONE narrow aggregate to a single row,
    * broadcast back. Terms are a QUERY (a handful), not a vocabulary —
    * for vocabulary-scale scoring use the exploded-token join shape of
    * [[unigramRarity]] instead. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String],
           k1: Double = Bm25K1, b: Double = Bm25B): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.forall(t => t.nonEmpty && t == t.toLowerCase),
      s"query terms must be non-empty lowercase tokens: $queryTerms")
    val text = col(textCol)
    def tf(term: String): Column =
      token_stop_counts(lower(trim(text)), Seq(term)).getField("stop_hits")
        .cast("long")
    // the per-doc frame (1 + |terms| kernel byte passes over every
    // document) feeds TWO branches — the stats aggregate and the scored
    // output — so cache it or the text passes run twice (plan-branch
    // recompute, SCALE.md); it is id + small ints per row, far smaller
    // than the text it replaces. Released via the OpCaches contract.
    val perDoc = OpCaches.registered(docs.select(
      (col(idCol).as("id") +:
        tokenCount(text).cast("long").as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) => tf(t).as(s"tf_$i") }): _*))
    val statCols = count(lit(1)).as("_n") +:
      sum(col("dl")).as("_sumdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"_df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val score = queryTerms.indices.map { i =>
      val tfi = col(s"tf_$i").cast("double")
      val idf = (col("_n") - col(s"_df_$i") + lit(0.5)) / (col(s"_df_$i") + lit(0.5))
      idf * (tfi * lit(k1 + 1.0)) /
        (tfi + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("id"), col("dl").as("n_tokens"), score.as("bm25"))
  }

  /** BPE merge-candidate statistics: adjacent character-pair counts
    * over the corpus, weighted by word frequency — the first-iteration
    * signal of byte-pair-encoding vocabulary induction (the pair with
    * the max count is the first merge; re-running after merges drives
    * the full BPE loop).
    *
    * Scale shape — the part that matters at 100 TB: the corpus
    * collapses to WORD FREQUENCIES first (one hash aggregate on the
    * token, the only corpus-sized shuffle), and pair explosion runs
    * over DISTINCT words weighted by their counts — cost proportional
    * to the VOCABULARY (≤ a few million rows at web scale, Zipf-bounded)
    * rather than the token stream. Exploding pairs per token occurrence
    * would be ~avg-word-frequency times more work for identical output.
    *
    * Single-character words contribute no pairs and are filtered BEFORE
    * the explode: Spark's `sequence(1, n)` generates a DESCENDING
    * sequence when n < 1 (it would emit [1, 0] — phantom pairs), unlike
    * SQL engines whose generate_series is empty there. `substr` is
    * character-based (UTF-8 aware) in Spark and DuckDB alike, so CJK
    * corpora count the same pairs. */
  def bpePairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(explode(
      filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")).as("w"))
    val wf = toks.groupBy("w").agg(count(lit(1)).as("f"))
    wf.where(length(col("w")) > 1)
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(1)).as("a"),
        col("w").substr(col("i") + 1, lit(1)).as("b"), col("f"))
      .groupBy("a", "b").agg(sum(col("f")).as("pair_count"))
  }

  /** Benchmark contamination via a Bloom-filter membership probe — the
    * 100 TB form of [[contamination]]. The exact operator probes with a
    * semi join, which builds/broadcasts a hash relation of every
    * benchmark shingle; here the benchmark reduces to a ~10-bits-per-
    * shingle sketch (built distributively — partial sketches OR-merge,
    * only sketch bytes move) and the probe is a narrow per-row
    * predicate on the corpus side: NO join operator at all
    * (plan-pinned), so the corpus never reshuffles and executor memory
    * holds sketch bytes instead of a hash relation. Two orders of
    * magnitude smaller reference state at the same probe cost.
    *
    * Error model: `n_flagged` can exceed the exact count by the false-
    * positive rate (~1% at the default 10 bits/item, one-sided — a miss
    * is impossible), which for a contamination SCREEN is the right
    * trade: flagged documents go to the exact [[contamination]] check
    * (candidate-then-verify, the same shape as every near-dup operator
    * here), unflagged ones are provably clean. The gating query pins
    * both properties: zero false negatives per document, FP mass under
    * bound.
    *
    * Driver state: the benchmark's distinct-shingle count (sketch
    * sizing) and the built sketch bytes — benchmark-sized driver work,
    * the same class as IVF's centroid table. */
  def contaminationBloom(docs: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, k: Int = 5,
                         bitsPerItem: Int = 10): DataFrame = {
    import graft.functions.BloomFunctions.{bloom_filter_agg, might_contain}
    require(bitsPerItem > 0, s"bitsPerItem must be positive: $bitsPerItem")
    // cached: the frame is materialized TWICE at construction (count for
    // sketch sizing, then the sketch-build aggregate) — uncached, the
    // benchmark-side tokenize/hash/distinct pipeline would run twice
    val benchSh = OpCaches.registered(
      Dedup.shingleHashed(benchmark, idCol, textCol, k)
        .select(explode(col("shh")).as("h")).distinct())
    val est = benchSh.count()
    val bloomBytes: Array[Byte] =
      if (est == 0) null
      else benchSh.agg(bloom_filter_agg(col("h"), est, est * bitsPerItem.toLong))
        .head.getAs[Array[Byte]](0)
    val hit =
      if (bloomBytes == null) lit(false) // empty benchmark: nothing can hit
      else might_contain(bloomBytes, col("h"))
    val docSh = Dedup.shingleHashed(docs, idCol, textCol, k)
      .select(col("id"), explode(array_distinct(col("shh"))).as("h"))
    val perDoc = docSh.groupBy("id").agg(
      count(lit(1)).as("n_shingles"),
      sum(when(hit, 1L).otherwise(0L)).as("n_flagged"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_flagged").cast("double") / col("n_shingles"), lit(0.0))
          .as("flagged_frac"))
  }

  def contamination(docs: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, k: Int = 5): DataFrame = {
    // cached: consumed by both the totals aggregate and the semi-join
    // hits — uncached, the per-row shingle hashing pass over the full
    // corpus runs twice per action (the recompute trap benchSh's
    // sibling contaminationBloom documents)
    val docSh = OpCaches.registered(Dedup.shingleHashed(docs, idCol, textCol, k)
      .select(col("id"), explode(array_distinct(col("shh"))).as("h")))
    val benchSh = Dedup.shingleHashed(benchmark, idCol, textCol, k)
      .select(explode(col("shh")).as("h")).distinct()
    val totals = docSh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = docSh.join(benchSh, Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    docs.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("n_contaminated").cast("double") / col("n_shingles"), lit(0.0))
          .as("contamination_frac"))
  }

  /** Corpus-trained bigram language-model quality scores — the
    * CCNet/KenLM-style perplexity filter (Wenzek et al. 2020): docs
    * whose token stream the corpus's own n-gram statistics find
    * improbable are boilerplate, gibberish, or wrong-language, and the
    * per-doc mean log-probability is the standard ranking signal. A
    * production pipeline loads a pretrained KenLM; the MECHANISM —
    * count tables joined per token position, smoothed conditional
    * probabilities, a length-normalized log sum — is identical and is
    * the part that must scale.
    *
    * Model: add-k smoothed bigram LM over lowercased whitespace
    * tokens, P(b|a) = (c(a,b) + k) / (c(a,·) + k·V), with c(a,·) the
    * count of bigrams starting at `a` and V the distinct-unigram
    * vocabulary. Documents with < 2 tokens score NULL (no bigram
    * evidence — a 0.0 would fake "perfectly probable").
    *
    * Cross-engine determinism: counts are exact longs; each bigram's
    * `ln P` is quantized to DECIMAL(18,6) BEFORE the per-doc sum (libm
    * `log` differs across engines in the last ulp — quantization at
    * 1e-6 collapses both readings to the same decimal except within a
    * half-ulp of a rounding boundary, probability ~1e-11 per value:
    * the q_dim_stats recipe), so the sum is order- and
    * engine-invariant; the final mean is one IEEE divide.
    *
    * Scale shape: the model IS a DataFrame (bigram/context counts —
    * vocabulary²-bounded, in practice Heaps-small), never driver
    * state: token positions explode once, join the count tables on the
    * bigram key (8-byte-ish keys, the exact-dedup shuffle class), one
    * per-doc aggregate. Three corpus passes total (unigram V, bigram
    * counts, scoring join) — scan-for-shuffle economics throughout. */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String,
                     k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0: $k")
    val toks = docs.select(col(idCol).as("id"),
      filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "").as("t"))
    // bigram positions: (id, a, b) per adjacent pair — cached, it feeds
    // the count aggregate AND the scoring join
    val pairs = OpCaches.registered(toks
      .where(size(col("t")) > 1)
      .select(col("id"), col("t"),
        posexplode(slice(col("t"), lit(1), size(col("t")) - 1)).as(Seq("i", "a")))
      .select(col("id"), col("a"), element_at(col("t"), col("i") + 2).as("b")))
    val vocab = toks.select(explode(col("t")).as("w")).agg(countDistinct(col("w")))
      .collect()(0).getLong(0)
    val bigramC = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val contextC = pairs.groupBy("a").agg(count(lit(1)).as("ca"))
    val scored = pairs
      .join(bigramC, Seq("a", "b"))
      .join(contextC, Seq("a"))
      .withColumn("_lp",
        log((col("cab") + lit(k)) / (col("ca") + lit(k * vocab)))
          .cast("decimal(18,6)"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lp")).as("_slp"))
      .withColumn("mean_logprob",
        col("_slp").cast("double") / col("n_bigrams"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), col("n_bigrams"), col("mean_logprob"))
  }

  /** BPE vocabulary induction (Sennrich et al. 2016): learn `numMerges`
    * rank-ordered merges from the corpus — the iterated form of
    * [[bpePairCounts]] (which is round 1 of this loop). Apply with
    * [[graft.functions.BpeFunctions.bpe_encode]].
    *
    * Scale shape: ONE corpus-sized pass builds the word-frequency
    * table; every round after that is vocabulary-sized — a pair-count
    * aggregate over the current segmentations (weighted by word
    * frequency, so corpus mass never re-enters) and one argmax row to
    * the driver. The driver holds only the merge list (model state).
    * Each round's re-segmentation is a greedy left-to-right fold of
    * the winning pair, applied via `aggregate` over the symbol arrays;
    * `localCheckpoint` truncates the per-round lineage exactly as in
    * [[Dedup.connectedComponents]] (an iterative algorithm needs
    * driver-controlled looping; without truncation the plan doubles
    * every round).
    *
    * Determinism: pair counts are exact longs; the winner ties break
    * to the binary-lexicographically smallest (a, b); word
    * segmentation is a pure function of the merge list. The learned
    * list is therefore identical across partitionings and runs. Rounds
    * stop early when no adjacent pair remains (every word fully
    * merged). */
  def bpeLearnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                     driverVocabMax: Long = 1000000L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    def chars(c: Column): Column =
      filter(split(c, ""), s => s =!= "") // code-point symbols
    var vocab = docs.select(explode(
      filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("f"), chars(col("w")).as("syms"))
      .localCheckpoint(true)
    // Fast path: a vocabulary under the cap collects to the driver and
    // the merge loop runs in memory — one distributed job instead of
    // 2·numMerges, and the collected word-frequency table is bounded
    // model state (Heaps' law keeps vocabularies in the millions at any
    // corpus size — the same reason production BPE trainers are
    // in-memory after the word-count pass). The distributed loop below
    // stays as the unbounded-vocabulary fallback; both paths apply the
    // same fuse rule and tiebreak (parity spec-pinned).
    if (vocab.count() <= driverVocabMax)
      return bpeLearnMergesDriver(
        vocab.collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray)),
        numMerges)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val top = vocab
        .where(size(col("syms")) > 1)
        .select(col("f"), col("syms"),
          posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1)).as(Seq("i", "a")))
        .withColumn("b", element_at(col("syms"), col("i") + 2))
        .groupBy("a", "b").agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val ab = a + b
        // greedy left-to-right fold of (a, b) — the same fuse rule the
        // encode kernel applies, so training and application agree
        vocab = vocab.select(col("f"),
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
              .otherwise(concat(acc, array(x)))).as("syms"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** In-memory merge loop over the collected word-frequency table.
    * Semantics mirror the distributed loop exactly: max pair count,
    * ties to the smallest (a, b) under UTF-8 BYTE order — Spark's
    * string ordering, NOT Java's `String.compareTo` (UTF-16 code-unit
    * order), which disagrees for supplementary characters vs high BMP
    * code points — then the greedy left-to-right fuse. */
  private def bpeLearnMergesDriver(words: Array[(Long, Array[String])],
                                   numMerges: Int): Seq[(String, String)] = {
    def byteLess(x: String, y: String): Boolean = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    val syms = words.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < syms.length) {
        val s = syms(w)
        val f = words(w)._1
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        w += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC &&
              (byteLess(p._1, best._1) ||
                (p._1 == best._1 && byteLess(p._2, best._2)))))
            { best = p; bestC = c }
        }
        val (a, b) = best
        merges += ((a, b))
        val ab = a + b
        var w2 = 0
        while (w2 < syms.length) {
          val s = syms(w2)
          if (s.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < s.length) {
              if (k < s.length - 1 && s(k) == a && s(k + 1) == b) {
                out += ab; k += 2
              } else { out += s(k); k += 1 }
            }
            if (out.length != s.length) syms(w2) = out.toArray
          }
          w2 += 1
        }
      }
    }
    merges.toSeq
  }

  /** The learned merge list as a writable frame `(rank, a, b)` — BPE's
    * model state in the house persistence idiom ([[graft.ops.Similarity.ivfCentroidsDf]]
    * precedent): train ONCE with [[bpeLearnMerges]] (the corpus-sized
    * pass), persist as ordinary parquet, and every later encode session
    * reloads the list instead of re-training. Rank is the merge's
    * learning order — BPE application is order-sensitive (each round's
    * fuse changes the next round's pair counts), so the rank column IS
    * the model, not bookkeeping. Strings round-trip parquet exactly
    * (UTF-8 byte-preserving), so a reloaded list encodes bit-identically
    * to the trained one (parity spec-pinned). */
  def bpeMergesDf(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
  }

  /** Reload the merge list written from [[bpeMergesDf]], rank order
    * restored. The rank column must be a dense 0..n-1 sequence — a
    * filtered or corrupted model frame fails by name instead of
    * silently training-drifting every later encode. */
  def bpeMergesFromDf(df: DataFrame): Seq[(String, String)] = {
    val rows = df.select(col("rank").cast("int"), col("a"), col("b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"bpe merge frame ranks are not the dense sequence 0..${rows.length - 1} " +
        "— the model was filtered or corrupted; re-persist from bpeMergesDf")
    rows.map(r => (r._2, r._3)).toSeq
  }

}
