package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.quality.{CheckResult, Checks, QualityCheck}

/** O2/O3 + S4–S6 — the pipeline runner: bronze → silver → gold → test,
  * with dbt-style view/table materialization and full-refresh semantics.
  *
  * Models are declared with dependencies and run in topological order
  * (the reference's dbt `ref()` graph, `f_loan_contract.sql:4,37-44`);
  * within a level, independent models could run from parallel threads
  * (`profiles.yml:11` threads: 4) — Spark's scheduler interleaves their
  * jobs. Views stay lazy temp views (recomputed, like dbt `view`
  * materialization); tables are written to parquet and re-registered
  * (dbt `table`), so downstream reads scan the materialized copy instead
  * of recomputing the lineage. A run is a full refresh: overwrite-mode
  * writes, idempotent (`dags/bank_etl_dag.py:58-64`).
  */
object Runner {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization
  /** Hive-style partitioned parquet table — the 100 TB materialization:
    * downstream filters on the partition columns prune whole directories
    * at the scan (visible as `PartitionFilters` in explain). */
  final case class PartitionedTable(partitionCols: Seq[String]) extends Materialization
  /** Bucketed catalog table: co-locates rows by hash of the bucket
    * columns at WRITE time, so joins/aggregations between tables bucketed
    * the same way need no shuffle at READ time — the standard way to
    * amortize one shuffle across every downstream join of a 100 TB fact.
    * Requires a catalog (saveAsTable), unlike the path-based modes. */
  final case class BucketedTable(bucketCols: Seq[String], numBuckets: Int)
    extends Materialization
  /** Incremental partitioned table (dbt incremental-model analogue):
    * dynamic partition overwrite replaces ONLY the partitions present in
    * this run's batch and leaves the rest of the table untouched — how a
    * 100 TB fact absorbs a daily batch without rewriting history. The
    * model's build should emit just the affected partitions (e.g. the
    * current load window); a full-refresh rebuild is the plain
    * [[PartitionedTable]]. */
  final case class IncrementalTable(partitionCols: Seq[String])
    extends Materialization

  /** One model: name, upstream model names, transform over the resolved
    * upstream frames, materialization, quality checks. */
  final case class Model(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      materialization: Materialization = View,
      checks: Seq[QualityCheck] = Nil)

  final case class RunResult(built: Seq[String], checks: Seq[CheckResult],
                             frames: Map[String, DataFrame]) {
    def passed: Boolean = checks.forall(_.passed)
    def apply(model: String): DataFrame = frames(model)
  }

  /** Topologically order models by their dep edges (Kahn). `external`
    * names (source/bronze frames) count as already satisfied. Cycles or
    * unknown deps fail fast with the offending names. */
  def topoOrder(models: Seq[Model], external: Set[String] = Set.empty): Seq[Model] = {
    // duplicate names would both run, with the later frame clobbering
    // the resolution map — the FIRST model's checks would then silently
    // validate the SECOND model's output
    val dup = models.groupBy(_.name).collect { case (n, ms) if ms.size > 1 => n }
    require(dup.isEmpty, s"duplicate model name(s): ${dup.mkString(", ")}")
    // a model sharing a name with an external source is the same bug in
    // a different coat: the source name counts as already-satisfied, so
    // a dependent listed earlier in the Seq would build from the RAW
    // source frame while a dependent listed later gets the model's
    // output — silent, input-order-dependent results
    val shadow = models.map(_.name).filter(external.contains)
    require(shadow.isEmpty,
      s"model name(s) shadow external source(s): ${shadow.mkString(", ")}")
    val byName = models.map(m => m.name -> m).toMap
    models.foreach { m =>
      val missing = m.deps.filterNot(d => byName.contains(d) || external.contains(d))
      require(missing.isEmpty, s"model ${m.name}: unknown deps $missing")
    }
    val order = scala.collection.mutable.ListBuffer.empty[Model]
    val done = scala.collection.mutable.Set.empty[String]
    done ++= external
    var remaining = models
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done))
      require(ready.nonEmpty, s"dependency cycle among ${remaining.map(_.name)}")
      order ++= ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    order.toList
  }

  /** Run all models (full refresh) then the quality suite — the engine's
    * `dbt run && dbt test`. `sources` seeds the resolution map (bronze
    * frames); `warehouseDir` hosts table materializations. */
  def run(spark: SparkSession, sources: Map[String, DataFrame],
          models: Seq[Model], warehouseDir: String): RunResult = {
    val resolved = scala.collection.mutable.Map[String, DataFrame](sources.toSeq: _*)
    val ordered = topoOrder(models, sources.keySet)
    ordered.foreach { m =>
      val df = m.build(resolved.toMap)
      val materialized = m.materialization match {
        case View =>
          df.createOrReplaceTempView(m.name)
          df
        case Table =>
          val path = s"$warehouseDir/${m.name}"
          df.write.mode("overwrite").parquet(path)
          val back = spark.read.parquet(path)
          back.createOrReplaceTempView(m.name)
          back
        case PartitionedTable(cols) =>
          val path = s"$warehouseDir/${m.name}"
          df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
          val back = spark.read.parquet(path)
          back.createOrReplaceTempView(m.name)
          back
        case IncrementalTable(cols) =>
          val path = s"$warehouseDir/${m.name}"
          df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(cols: _*).parquet(path)
          val back = spark.read.parquet(path)
          back.createOrReplaceTempView(m.name)
          back
        case BucketedTable(cols, n) =>
          // external table pinned under warehouseDir (a bare saveAsTable
          // would write to the session-global warehouse). The table NAME
          // is still catalog-global — bucketing metadata only lives in a
          // catalog, so concurrent runs sharing one session must use
          // distinct model names. A stale temp view from a previous
          // View-materialized run of this name would shadow the catalog
          // table in spark.table — drop it first.
          spark.catalog.dropTempView(m.name)
          df.write.mode("overwrite")
            .bucketBy(n, cols.head, cols.tail: _*)
            .sortBy(cols.head, cols.tail: _*)
            .option("path", s"$warehouseDir/${m.name}")
            .saveAsTable(m.name)
          spark.table(m.name)
      }
      resolved(m.name) = materialized
    }
    val checkResults = Checks.run(ordered.collect {
      case m if m.checks.nonEmpty => (m.name, resolved(m.name), m.checks)
    })
    RunResult(ordered.map(_.name), checkResults, resolved.toMap)
  }
}
