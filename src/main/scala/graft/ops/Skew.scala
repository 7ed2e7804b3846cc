package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for 100 TB keys that don't hash evenly.
  *
  * AQE's skew-join splitting handles join-side skew at runtime; these
  * helpers cover the aggregation side — a whale key (one dealer with 10%
  * of all loans) funnels its whole group through one reducer unless the
  * aggregation is two-phase.
  */
object Skew {

  /** Salted join for a skewed BIG side: big rows get a deterministic
    * salt (hash of a high-cardinality tiebreaker mod `saltBuckets`), the
    * small side replicates once per salt value, and the join runs equi
    * on (key, salt) — a whale key's rows spread over `saltBuckets`
    * tasks. The result provably equals the unsalted join (the oracle for
    * `q_salted_join` IS the plain join). Use when a single key exceeds
    * one task even after AQE skew-splitting, or where AQE isn't
    * available (streaming micro-batch joins); the cost is shuffling
    * `saltBuckets` copies of the small side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, saltBy: Column): DataFrame = {
    // saltBuckets = 0 would explode an EMPTY array on the small side —
    // every small row silently dropped, the join silently empty, the
    // documented equals-the-unsalted-join guarantee broken with no error
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not carry a _salt column (it would be clobbered by the " +
        "synthesized salt and dropped from the result)")
    val b = big.withColumn("_salt", pmod(xxhash64(saltBy), lit(saltBuckets.toLong)))
    val s = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: rows get a
    * random-ish deterministic salt (hash of a tiebreaker column mod
    * `saltBuckets`), phase 1 aggregates per (key, salt) — spreading a
    * whale key over `saltBuckets` reducers — phase 2 re-aggregates the
    * partials per key.
    *
    * `partials` lists (outCol, phase1Agg, phase2Merge): e.g. a count is
    * (count(*), sum(partial)); a sum is (sum(x), sum(partial)); an avg
    * must ship (sum, count) partials and divide after phase 2.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBy: Column,
                      saltBuckets: Int,
                      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    // pmod(x, 0) is NULL — phase 1 would collapse to one NULL salt per
    // key, silently unspread; fail loudly like saltedJoin
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    require(!df.columns.contains("_salt"),
      "input must not carry a _salt column (it would be clobbered by the " +
        "synthesized salt)")
    val salted = df.withColumn("_salt", pmod(xxhash64(saltBy), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(s"_p_${partials.head._1}"),
        partials.tail.map { case (name, agg, _) => agg.as(s"_p_$name") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"_p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (name, _, merge) => merge(col(s"_p_$name")).as(name) }: _*)
  }
}
