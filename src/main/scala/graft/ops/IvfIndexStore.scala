package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned persistence for the IVF ANN index — the
  * [[VersionedState]] snapshot protocol (shared with
  * [[MinhashIndexStore]] and [[SemanticIndexStore]]) applied to
  * [[Similarity.ivfBuild]]'s state: the trained centroid table and the
  * per-row cell assignment frame `(corpus_id, cv, cn, cell)`, written
  * together per version so a probe always scores against exactly the
  * centroids its cells were assigned with.
  *
  * Maintenance is the incremental path the [[Similarity.ivfBuild]]
  * Scaladoc promises: [[append]] assigns a NEW vector batch against
  * the STANDING centroid literal (one narrow map — no retrain, no
  * shuffle beyond the write) and unions it into the cell frame.
  * Retraining for a drifted corpus is an explicit delete-and-rebuild.
  * [[probeLatest]] scores queries against a pinned version through
  * [[Similarity.ivfProbe]], and the I/O matches the algorithm: the
  * cell frame is WRITTEN partitioned by `cell`, the batch's touched
  * cells ([[Similarity.ivfProbeCells]], ≤ nlist ids) become a static
  * partition filter, and the scan reads only those cell directories —
  * nprobe/nlist of the corpus bytes at any scale (plan-spec-pinned),
  * instead of a full scan a join then discards.
  *
  * Layout: `dir/v=N/centroids`, `dir/v=N/cells/cell=<id>/`,
  * `dir/v=N/meta` (`dim`, `nlist`). Doubles round-trip parquet
  * bit-exactly, so a reloaded version probes identically
  * (spec-pinned). */
object IvfIndexStore {

  /** Persisted provenance: embedding dimension and trained cell count. */
  final case class IvfMeta(dim: Int, nlist: Int)

  /** A committed version loaded for probing. */
  final case class LoadedIvfIndex(version: Long,
                                  centroids: Seq[(Long, Seq[Double])],
                                  cells: DataFrame, meta: IvfMeta)

  private val Subframes = Seq("centroids", "cells", "meta")

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    VersionedState.latestVersion(spark, dir, Subframes)

  private def writeMeta(spark: SparkSession, dest: String, meta: IvfMeta): Unit = {
    import spark.implicits._
    Seq((meta.dim, meta.nlist)).toDF("dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(dest)
  }

  private def readMeta(spark: SparkSession, dir: String, v: Long): IvfMeta = {
    val r = spark.read.parquet(s"$dir/v=$v/meta").select("dim", "nlist").head()
    IvfMeta(r.getInt(0), r.getInt(1))
  }

  private def commitVersion(spark: SparkSession, dir: String, v: Long,
                            centroids: Seq[(Long, Seq[Double])],
                            cells: DataFrame): Unit =
    VersionedState.commitVersion(spark, dir, v, "ivf index",
      Subframes) { scratch =>
      Similarity.ivfCentroidsDf(spark, centroids)
        .coalesce(1).write.mode("overwrite").parquet(s"$scratch/centroids")
      // the cell frame's on-disk layout IS the probe's scale story:
      // partitioned by cell, a probe batch reads only its touched
      // cell directories (nprobe/nlist of the corpus), pruned by the
      // static IN filter probeLatest derives — not a full scan that a
      // join then discards. The repartition co-locates each cell in
      // one writer task BEFORE partitionBy: without it every task
      // writes a sliver of every cell it holds — task_count × nlist
      // small files at cluster scale — where co-located cells write
      // one file each. One shuffle per COMMIT (build/append, the
      // amortized side), zero per probe.
      cells.repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$scratch/cells")
      writeMeta(spark, s"$scratch/meta",
        IvfMeta(centroids.head._2.length, centroids.length))
    }

  /** Train on the standing corpus and write v=0. Refuses a directory
    * already holding a committed version, and an empty/all-null corpus
    * (no centroids to stand on). Returns 0. */
  def init(corpus: DataFrame, dir: String, idCol: String, vecCol: String,
           nlist: Int = 16, lloydIters: Int = 2): Long = {
    val spark = corpus.sparkSession
    val (fs, path) = VersionedState.fsPath(spark, dir)
    val existing = VersionedState.versions(fs, path)
      .filter(VersionedState.committed(fs, dir, _, Subframes))
    require(existing.isEmpty,
      s"ivf index at $dir already holds committed versions " +
        s"(${existing.sorted.map("v=" + _).mkString(",")}) — init would " +
        "retrain from the new corpus alone, silently dropping the standing " +
        "index; append onto the latest version, or explicitly delete the " +
        "directory to start over")
    val (centroids, cells) = Similarity.ivfBuild(corpus, idCol, vecCol,
      nlist, lloydIters)
    require(centroids.nonEmpty,
      s"ivf index at $dir: the corpus trained no centroids (empty or " +
        "all-null vectors) — an empty standing index has nothing to probe")
    commitVersion(spark, dir, 0L, centroids, cells)
    0L
  }

  /** Assign a new vector batch against the STANDING centroids (one
    * narrow map) and write `expectedBase + 1` with the rows appended.
    * The base must be the latest committed version. Ids must be unique
    * across the merged corpora. Returns the version written. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String, vecCol: String, expectedBase: Long): Long = {
    val latest = latestVersion(spark, dir)
    require(latest.contains(expectedBase),
      s"ivf index at $dir: append expected base v=$expectedBase but the " +
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
    val assigned = Similarity.ivfAssign(batch, idCol, vecCol, loaded.centroids)
    commitVersion(spark, dir, expectedBase + 1, loaded.centroids,
      loaded.cells.unionByName(assigned))
    expectedBase + 1
  }

  /** Delete versions strictly below `keepFrom`; never the head. */
  def prune(spark: SparkSession, dir: String, keepFrom: Long): Seq[Long] =
    VersionedState.prune(spark, dir, keepFrom, Subframes, "ivf index")

  /** Load a pinned version (or the latest committed). A missing or
    * uncommitted pin fails by name. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): LoadedIvfIndex = {
    val (fs, _) = VersionedState.fsPath(spark, dir)
    val v = version match {
      case Some(p) =>
        require(VersionedState.committed(fs, dir, p, Subframes),
          s"ivf index at $dir has no committed version v=$p " +
            s"(latest committed: ${latestVersion(spark, dir).map("v=" + _)
              .getOrElse("<none>")})")
        p
      case None =>
        latestVersion(spark, dir).getOrElse(
          throw new IllegalArgumentException(
            s"ivf index at $dir has no committed version"))
    }
    val meta = readMeta(spark, dir, v)
    val centroids = Similarity.ivfCentroidsFromDf(
      spark.read.parquet(s"$dir/v=$v/centroids"))
    require(centroids.nonEmpty && centroids.head._2.length == meta.dim,
      s"ivf index at $dir v=$v: centroid table does not match its " +
        s"persisted meta ($meta) — the version directory was tampered with")
    LoadedIvfIndex(v, centroids, readCells(spark, dir, v, None), meta)
  }

  /** The cell frame of a committed version, optionally pruned to a
    * probe's touched cells. The prune filter goes on the RAW inferred
    * partition column (int — cell ids are 0..nlist-1, always
    * int-safe) BEFORE the long cast that restores in-memory schema
    * parity, so `PruneFileSourcePartitions` sees a plain
    * partition-attribute IN list and the scan reads only the touched
    * cell directories (plan-spec-pinned). */
  private def readCells(spark: SparkSession, dir: String, v: Long,
                        onlyCells: Option[Seq[Long]]): DataFrame = {
    val raw = spark.read.parquet(s"$dir/v=$v/cells")
    val pruned = onlyCells match {
      case Some(cs) => raw.where(col("cell").isin(cs.map(_.toInt): _*))
      case None => raw
    }
    pruned.withColumn("cell", col("cell").cast("long"))
  }

  /** Score queries against the latest committed version (or a pinned
    * one): cosine top-k, each query touching only its `nprobe` nearest
    * standing cells. */
  def probeLatest(spark: SparkSession, dir: String, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, nprobe: Int = 8,
                  version: Option[Long] = None): DataFrame = {
    val loaded = read(spark, dir, version)
    // the probe's touched-cell set (≤ nlist ids, model-sized driver
    // state) becomes a static partition filter: the scan reads
    // nprobe/nlist of the corpus bytes, not all of them
    val touched = Similarity.ivfProbeCells(queries, vecCol,
      loaded.centroids, nprobe)
    Similarity.ivfProbe(loaded.centroids,
      readCells(spark, dir, loaded.version, Some(touched)), queries,
      idCol, vecCol, k, nprobe)
  }
}
