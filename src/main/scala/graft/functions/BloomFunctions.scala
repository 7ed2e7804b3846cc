package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Column-API entry points for Spark's built-in Bloom-filter sketch
  * expressions (the machinery behind runtime row-level filtering,
  * `org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate`
  * and `BloomFilterMightContain` — public catalyst classes with no
  * public function surface; reached through the documented Bridge).
  *
  * Why: membership probes against a reference set (benchmark shingles,
  * blocklist hashes) are usually written as a semi join — which shuffles
  * (or at best broadcasts a hash relation of) the WHOLE reference set.
  * A Bloom filter compresses the set to ~10 bits/item at 1% false
  * positives, two orders of magnitude smaller than the hash relation,
  * and the probe becomes a narrow per-row predicate: no join operator,
  * no shuffle, no build side in executor memory beyond the sketch
  * bytes. At 100 TB that is the difference between "re-shuffle the
  * corpus against a 10 GB benchmark relation" and "ship a 50 MB sketch
  * with the task closures". The tradeoff is one-sided error: a `true`
  * may be a false positive (rate set by the bits/item sizing), a
  * `false` is always exact — callers either tolerate the overcount or
  * re-verify positives exactly (the candidate-then-verify shape every
  * near-dup operator here already uses).
  */
object BloomFunctions {

  /** Aggregate a LongType column into a serialized Bloom filter
    * (BinaryType, one row). Distributed build: each partition fills a
    * partial sketch, partials OR-merge — nothing but the fixed-size
    * sketch ever moves. `numBits ≈ 10 × expectedItems` gives ~1% false
    * positives; Spark clamps both against its runtime-filter conf
    * ceilings. */
  def bloom_filter_agg(values: Column, expectedItems: Long, numBits: Long): Column = {
    require(expectedItems > 0 && numBits > 0,
      s"bloom sizing must be positive: items=$expectedItems bits=$numBits")
    Bridge.column(new BloomFilterAggregate(Bridge.expression(values),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe of a LongType column against a built sketch. The
    * sketch ships as a BinaryType literal in the plan (broadcast with
    * the task closures — it IS the compact alternative to a join build
    * side); `might_contain` requires a constant there by design. */
  def might_contain(bloom: Array[Byte], value: Column): Column = {
    require(bloom != null && bloom.nonEmpty, "empty bloom filter bytes")
    Bridge.column(BloomFilterMightContain(Literal(bloom, BinaryType),
      Bridge.expression(value)))
  }
}
