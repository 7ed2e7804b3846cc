package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test layer as DataFrame
  * assertions. Ref: `/root/reference/dbt/models/staging/staging.yml:12-28`,
  * `marts_core.yml:3-16` (not_null / unique on key columns), executed like
  * `dbt test` (`dags/bank_etl_dag.py:66-72`): a failing check returns the
  * violating-row count rather than throwing, so a runner can aggregate.
  *
  * Scale notes: notNull is a single filtered count (pushdown-friendly);
  * unique is one hash aggregate — both single-shuffle or less. accepted
  * values is a broadcast-free isin filter.
  */
sealed trait QualityCheck {
  def name: String
  /** Number of violating rows (0 = pass). */
  def violations(df: DataFrame): Long
}

final case class NotNull(column: String) extends QualityCheck {
  val name = s"not_null($column)"
  def violations(df: DataFrame): Long = df.where(col(column).isNull).count()
}

final case class Unique(column: String) extends QualityCheck {
  val name = s"unique($column)"
  def violations(df: DataFrame): Long =
    df.where(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count()
}

final case class AcceptedValues(column: String, values: Seq[String]) extends QualityCheck {
  val name = s"accepted_values($column)"
  def violations(df: DataFrame): Long =
    df.where(col(column).isNotNull && !col(column).isin(values: _*)).count()
}

/** Referential integrity: every non-null FK value exists in the parent
  * (dbt `relationships` test). Left-anti join — no row explosion. */
final case class RelationshipTo(column: String, parent: () => DataFrame,
                                parentColumn: String) extends QualityCheck {
  val name = s"relationship($column -> $parentColumn)"
  def violations(df: DataFrame): Long =
    df.where(col(column).isNotNull)
      .join(parent().select(col(parentColumn)), col(column) === col(parentColumn), "left_anti")
      .count()
}

final case class CheckResult(model: String, check: String, violations: Long) {
  def passed: Boolean = violations == 0
}

object Checks {
  /** Run a suite like `dbt test`: every check against its model, all
    * results collected (no fail-fast), overall pass = no violations. */
  def run(suite: Seq[(String, DataFrame, Seq[QualityCheck])]): Seq[CheckResult] =
    for {
      (model, df, checks) <- suite
      check <- checks
    } yield CheckResult(model, check.name, check.violations(df))
}
