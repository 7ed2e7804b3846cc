package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data mix construction: deterministic stratified sampling and
  * epoch-weighted source mixing — how a corpus with per-source /
  * per-language target proportions is actually assembled before
  * tokenization (e.g. "2 epochs of books, 0.3 epochs of web").
  *
  * Everything is a narrow per-row decision from a deterministic bucket —
  * no shuffle, no RNG state, reproducible across runs/partitionings, and
  * exactly reproducible by any engine with 64-bit integer arithmetic
  * (the oracle mirrors it in SQL). The epoch fan-out is an explode of a
  * tiny per-row sequence; output size is Σ weight_s × |stratum_s|.
  */
object Mix {

  /** Deterministic pseudo-random bucket in [0, 1000) from any 64-bit
    * integer key: pre-mod (POSITIVE modulus via pmod — a plain `%` on a
    * negative key, e.g. an xxhash64 of a string id, would carry the sign
    * through the shift and make every `bucket < threshold` decision
    * trivially true) to bound the product, multiply by the salt's
    * odd constant, keep the product's bits 32..63, scale to [0, 1000) by
    * taking the HIGH 10-ish bits (multiply-shift). Deliberately NOT
    * xxhash64 — portability to the SQL oracle matters more here than
    * hash quality; every step is plain 64-bit integer arithmetic
    * (max intermediate ≈ 2^52, far from overflow) that DuckDB replays
    * verbatim: `((key % 1000003) * C % 4294967296) * 1000 >> 32` for
    * non-negative keys; a key column that can go negative mirrors the
    * pmod as `(((key % 1000003) + 1000003) % 1000003)`.
    *
    * The HIGH bits matter: `(x*C) % 1000` depends only on `x % 1000`,
    * so a low-bits bucket is merely an affine permutation of the key's
    * last three digits — and any two salts folded in additively become
    * a constant rotation of each other (fully correlated decisions).
    * Taking bits 32+ of `x*C` uses the full product, and one DISTINCT
    * multiplier per salt makes decisions from the same key behave
    * independently (measured pairwise P(b<t | a<t) = t ± 0.0002 across
    * all salt pairs over 100k sequential keys).
    *
    * `salt` selects the decision: sampling, mixing, and splitting each
    * use their own, so composing them on one key column does not
    * correlate keep / extra-epoch / train-val-test outcomes. */
  def bucket1000(key: Column, salt: Long = 0L): Column =
    shiftright(
      pmod(key, lit(1000003L)) * lit(multiplier(salt)) % lit(4294967296L) * lit(1000L),
      32)

  /** The salt's multiplier (xxhash-family odd primes; mirrored verbatim
    * in every oracle's SQL). */
  def multiplier(salt: Long): Long = salt match {
    case 0L => 2654435761L
    case 1L => 2246822519L
    case 2L => 3266489917L
    case 3L => 668265263L
    case other => throw new IllegalArgumentException(
      s"no multiplier registered for salt $other — add one (odd, < 2^32)")
  }

  /** Per-operator salts. */
  val SampleSalt = 1L
  val MixSalt    = 2L

  private def chain(strataCol: String, m: Map[String, Long], default: Long): Column =
    m.foldLeft(lit(default)) { case (acc, (s, v)) =>
      when(col(strataCol) === s, lit(v)).otherwise(acc)
    }

  /** Keep a per-stratum permille of rows (strata absent from the map are
    * dropped). One codegen'd filter, no shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       permille: Map[String, Int], key: Column): DataFrame = {
    require(permille.values.forall(p => p >= 0 && p <= 1000),
      s"permille out of [0,1000]: $permille")
    df.where(bucket1000(key, SampleSalt) <
      chain(strataCol, permille.map { case (k, v) => k -> v.toLong }, 0L))
  }

  /** Epoch-weighted mix: each row of stratum s appears floor(w_s) times
    * plus once more with probability frac(w_s) (decided by the
    * deterministic bucket). Adds an `epoch` column (1-based); strata
    * absent from the map are dropped. Weights are permille-quantized. */
  def weightedMix(df: DataFrame, strataCol: String,
                  weights: Map[String, Double], key: Column): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w < 1000),
      s"weights out of [0,1000): $weights")
    val fullEpochs = weights.map { case (s, w) => s -> w.toLong }
    val fracPermille = weights.map { case (s, w) =>
      s -> math.round((w - w.toLong) * 1000)
    }
    val nEpochs = chain(strataCol, fullEpochs, 0L) +
      when(bucket1000(key, MixSalt) < chain(strataCol, fracPermille, 0L), 1L).otherwise(0L)
    // sequence(1, 0) counts DOWN in Spark — the n<1 guard is load-bearing
    df.withColumn("_n", nEpochs)
      .withColumn("epoch",
        explode(when(col("_n") < 1, array().cast("array<bigint>"))
          .otherwise(sequence(lit(1L), col("_n")))))
      .drop("_n")
  }
}
