package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changeset application — the MERGE INTO / APPLY CHANGES pattern:
  * fold a stream of keyed insert/update/delete events into a base
  * snapshot. Complements [[graft.gold.Scd2]] (which keeps history;
  * this produces the current-state table) and the incremental
  * partition-overwrite sink (which replaces whole partitions; this
  * merges row-level changes).
  *
  * Semantics: per key, the change with the highest `seqCol` wins
  * (ties break by `opCol` descending — "U" over "I" over "D" is NOT
  * assumed; callers should make `seqCol` a total order per key, the
  * tie-break only pins determinism). A winning "D" removes the key;
  * any other op upserts the change row's payload columns. A winning
  * row with a NULL op fails fast: the key is already anti-joined out
  * of the base by then, so treating null as "not the delete op" OR as
  * a delete would both be silent guesses — dirty op columns must
  * surface, not pick one.
  *
  * Scale shape: one shuffle of the CHANGES by key for the latest-wins
  * window (changesets are normally ≪ base), then a left-anti join
  * (AQE broadcasts the latest-change key set when it fits) plus a
  * union — the base is never shuffled, which is what makes this viable
  * against a 100 TB snapshot with a daily changeset. */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   seqCol: String, opCol: String,
                   deleteOp: String = "D"): DataFrame = {
    val dataCols = base.columns.toSeq
    val missing = dataCols.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes frame lacks base columns: $missing")
    require(keys.nonEmpty && keys.forall(dataCols.contains),
      s"keys must be base columns: $keys")
    require(!changes.columns.contains("_rn"),
      "changes frame carries a column named _rn — it would be overwritten " +
        "by the latest-wins window rank; rename it first")
    // null seq gets the same loud treatment as null op: under the desc
    // order a NULL sequence sorts LAST, so a dirty null-seq change
    // quietly loses (and when ALL of a key's changes are null-seq, the
    // op column alone picks the winner) — dirty control columns must
    // surface, not silently pick one. The guard rides the window's own
    // order expression, so pruning cannot eliminate it.
    val seqChecked = when(col(seqCol).isNull, raise_error(format_string(
      s"applyChanges: null %s on a change for key (%s) — ordering is " +
        "undefined; clean the sequence column",
      lit(seqCol), concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
      .otherwise(col(seqCol))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqChecked.desc, col(opCol).desc)
    val latest = changes.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
    val untouched = base.join(latest.select(keys.map(col): _*), keys, "left_anti")
    // the null-op guard rides the filter's own input (not a dropped side
    // column, so pruning can't eliminate it): a null op here would make
    // `op =!= deleteOp` null, silently dropping the upsert AFTER the
    // anti-join already removed the key — a silent delete
    val opChecked = when(col(opCol).isNull, raise_error(format_string(
      s"applyChanges: null %s on the winning change for key (%s) — null is " +
        "neither a delete nor an upsert; clean the op column",
      lit(opCol), concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
      .otherwise(col(opCol))
    val upserts = latest.where(opChecked =!= deleteOp)
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
