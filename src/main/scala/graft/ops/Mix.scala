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

  /** Deterministic pseudo-random bucket in [0, 1000) from a non-negative
    * integer key: pre-mod to bound the product, then a Knuth
    * multiplicative hash. Deliberately NOT xxhash64 — portability to the
    * SQL oracle matters more here than hash quality, and decorrelating
    * from id order is all sampling needs.
    *
    * `salt` decorrelates DECISIONS made from the same key: sampling and
    * mixing each use their own salt, so composing them on one key column
    * does not correlate keep/extra-epoch outcomes (after sampling stratum
    * s at permille p every survivor would otherwise have bucket < p, and
    * a fractional epoch weight would apply to all-or-none of them).
    * Salts must stay small (< ~10^3) so the product stays far from Long
    * overflow — the oracle replays the identical 64-bit arithmetic. */
  def bucket1000(key: Column, salt: Long = 0L): Column =
    (key % lit(1000003L) + lit(salt)) * lit(2654435761L) % lit(1000L)

  /** Per-operator salts (mirrored in every oracle's SQL). */
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
