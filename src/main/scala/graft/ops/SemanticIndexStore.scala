package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned persistence for the SemDeDup semantic index — the
  * [[VersionedState]] snapshot protocol (shared with
  * [[MinhashIndexStore]]) applied to
  * [[Similarity.semanticIndexBuild]]'s state: the k-means centroid
  * table and the grouped-and-assigned cell frame, written together per
  * version so every committed version can serve
  * [[Similarity.semanticDedupBatch]] against exactly the centroids its
  * cells were assigned with — a probe or append can never pair a cell
  * frame with drifted centroids.
  *
  * Layout: `dir/v=N/centroids` ([[Similarity.ivfCentroidsDf]]'s
  * `(cell, centroid)` frame), `dir/v=N/cells` (the `(cell, gid, vv,
  * vn, ids)` frame), `dir/v=N/meta` (one row: embedding `dim` and
  * trained `nlist` — provenance plus the cheap dimension sanity
  * check). Doubles and long arrays round-trip parquet bit-exactly, so
  * a reloaded version probes identically (spec-pinned).
  *
  * Maintenance follows the [[MinhashIndexStore]] rules verbatim:
  * [[init]] refuses a directory holding a committed version; [[append]]
  * names its exact base and assigns the delta against the STANDING
  * centroids ([[Similarity.semanticIndexAppend]] — retraining is an
  * explicit delete-and-rebuild, never a maintenance side effect);
  * crash replay of either is just running it again; [[prune]] keeps
  * the head. Scale shape: append pays one vector-keyed merge shuffle
  * (the amortized maintenance job); probes broadcast the batch's cells
  * against the standing frame, which never shuffles (plan-pinned in
  * `PlanQualitySpec`). */
object SemanticIndexStore {

  /** Persisted provenance of a version: embedding dimension and the
    * trained cell count. */
  final case class SemMeta(dim: Int, nlist: Int)

  /** A committed version loaded for probing. */
  final case class LoadedSemIndex(version: Long,
                                  centroids: Seq[(Long, Seq[Double])],
                                  cells: DataFrame, meta: SemMeta)

  private val Subframes = Seq("centroids", "cells", "meta")

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    VersionedState.latestVersion(spark, dir, Subframes)

  private def writeMeta(spark: SparkSession, dest: String, meta: SemMeta): Unit = {
    import spark.implicits._
    Seq((meta.dim, meta.nlist)).toDF("dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(dest)
  }

  private def readMeta(spark: SparkSession, dir: String, v: Long): SemMeta = {
    val r = spark.read.parquet(s"$dir/v=$v/meta").select("dim", "nlist").head()
    SemMeta(r.getInt(0), r.getInt(1))
  }

  private def commitVersion(spark: SparkSession, dir: String, v: Long,
                            centroids: Seq[(Long, Seq[Double])],
                            cells: DataFrame): Unit =
    VersionedState.commitVersion(spark, dir, v, "semantic index",
      Subframes) { scratch =>
      Similarity.ivfCentroidsDf(spark, centroids)
        .coalesce(1).write.mode("overwrite").parquet(s"$scratch/centroids")
      // cell-partitioned layout, each cell co-located into one writer
      // task (the IvfIndexStore rationale: probe scans prune to the
      // batch's touched cells; the repartition keeps file counts at
      // one per cell instead of task_count × nlist). One shuffle per
      // COMMIT, zero per probe. Null cells (null/absent vectors) land
      // in the hive default partition and are read back as null.
      cells.repartition(org.apache.spark.sql.functions.col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$scratch/cells")
      writeMeta(spark, s"$scratch/meta",
        SemMeta(centroids.head._2.length, centroids.length))
    }

  /** Train on the standing corpus and write the initial version (v=0).
    * Refuses a directory already holding a committed version (the
    * [[MinhashIndexStore.init]] rationale) and an empty corpus (no
    * centroids — an empty standing index has nothing to probe; start
    * indexing when the first real batch lands). Returns 0. */
  def init(df: DataFrame, dir: String, idCol: String, vecCol: String,
           nlist: Int = 0, lloydIters: Int = 2,
           maxGroupSize: Int = Dedup.DefaultMaxGroupSize): Long = {
    val spark = df.sparkSession
    val (fs, path) = VersionedState.fsPath(spark, dir)
    val existing = VersionedState.versions(fs, path)
      .filter(VersionedState.committed(fs, dir, _, Subframes))
    require(existing.isEmpty,
      s"semantic index at $dir already holds committed versions " +
        s"(${existing.sorted.map("v=" + _).mkString(",")}) — init would " +
        "retrain from the new corpus alone, silently dropping the standing " +
        "index; append onto the latest version, or explicitly delete the " +
        "directory to start over")
    val (centroids, cells) = Similarity.semanticIndexBuild(
      df, idCol, vecCol, nlist, lloydIters, maxGroupSize)
    require(centroids.nonEmpty,
      s"semantic index at $dir: the corpus trained no centroids (empty or " +
        "all-null vectors) — an empty standing index has nothing to probe")
    commitVersion(spark, dir, 0L, centroids, cells)
    0L
  }

  /** Fold a new batch into version `expectedBase`'s cell frame — with
    * the STANDING centroids, never a retrain — and write
    * `expectedBase + 1`. The base must be the latest committed version
    * (the [[MinhashIndexStore.append]] staleness/prune semantics).
    * Returns the version written. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String, vecCol: String, expectedBase: Long,
             maxGroupSize: Int = Dedup.DefaultMaxGroupSize): Long = {
    val latest = latestVersion(spark, dir)
    require(latest.contains(expectedBase),
      s"semantic index at $dir: append expected base v=$expectedBase but the " +
        s"latest committed version is ${latest.map("v=" + _).getOrElse("<none>")} — " +
        (latest match {
          case Some(l) if l > expectedBase =>
            "another maintainer already advanced the index; re-read the head " +
              "and retry the append on it"
          case Some(_) =>
            "the expected base was never committed (crashed append?); retry " +
              "from the committed head"
          case None =>
            "the base was pruned or the index was never initialized"
        }))
    val loaded = read(spark, dir, Some(expectedBase))
    val merged = Similarity.semanticIndexAppend(loaded.centroids,
      loaded.cells, batch, idCol, vecCol, maxGroupSize)
    commitVersion(spark, dir, expectedBase + 1, loaded.centroids, merged)
    expectedBase + 1
  }

  /** Delete versions strictly below `keepFrom`; never the head. */
  def prune(spark: SparkSession, dir: String, keepFrom: Long): Seq[Long] =
    VersionedState.prune(spark, dir, keepFrom, Subframes, "semantic index")

  /** Load a pinned version (or the latest committed). A missing or
    * uncommitted pin fails by name. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): LoadedSemIndex = {
    val (fs, _) = VersionedState.fsPath(spark, dir)
    val v = version match {
      case Some(p) =>
        require(VersionedState.committed(fs, dir, p, Subframes),
          s"semantic index at $dir has no committed version v=$p " +
            s"(latest committed: ${latestVersion(spark, dir).map("v=" + _)
              .getOrElse("<none>")})")
        p
      case None =>
        latestVersion(spark, dir).getOrElse(
          throw new IllegalArgumentException(
            s"semantic index at $dir has no committed version"))
    }
    val meta = readMeta(spark, dir, v)
    val centroids = Similarity.ivfCentroidsFromDf(
      spark.read.parquet(s"$dir/v=$v/centroids"))
    require(centroids.nonEmpty && centroids.head._2.length == meta.dim,
      s"semantic index at $dir v=$v: centroid table does not match its " +
        s"persisted meta ($meta) — the version directory was tampered with")
    LoadedSemIndex(v, centroids, readCells(spark, dir, v, None), meta)
  }

  /** The cell frame of a committed version, optionally pruned to a
    * batch's touched cells — the [[IvfIndexStore]] read shape: the
    * prune filter goes on the RAW inferred partition column (int —
    * cell ids are 0..nlist-1) before the long cast that restores
    * in-memory schema parity, so the scan reads only the touched cell
    * directories. Null-cell rows (null vectors) are excluded by the
    * prune, which loses nothing: a null cell can never equi-join. */
  private def readCells(spark: SparkSession, dir: String, v: Long,
                        onlyCells: Option[Seq[Long]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = spark.read.parquet(s"$dir/v=$v/cells")
    val pruned = onlyCells match {
      case Some(cs) => raw.where(col("cell").isin(cs.map(_.toInt): _*))
      case None => raw
    }
    pruned.withColumn("cell", col("cell").cast("long"))
  }

  /** The production probe entry point: semantic near-dup pairs of
    * `batch` against the latest committed version (or a pinned one),
    * always with the centroids the standing cells were assigned
    * under. */
  def probeLatest(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, vecCol: String, threshold: Double,
                  maxGroupSize: Int = Dedup.DefaultMaxGroupSize,
                  version: Option[Long] = None): DataFrame = {
    val loaded = read(spark, dir, version)
    // the batch only pairs within its own argmin cells (one per
    // distinct vector, ≤ nlist ids — model-sized driver state), so
    // they become a static partition filter: the standing scan reads
    // the touched cell directories, not the whole frame
    val touched = Similarity.ivfProbeCells(batch, vecCol,
      loaded.centroids, nprobe = 1)
    Similarity.semanticDedupBatch(loaded.centroids,
      readCells(spark, dir, loaded.version, Some(touched)), batch,
      idCol, vecCol, threshold, maxGroupSize)
  }
}
