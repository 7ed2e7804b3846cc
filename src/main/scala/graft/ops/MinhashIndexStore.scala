package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned persistence for the MinHash/LSH index — the
  * [[VersionedState]] snapshot protocol applied to
  * [[Dedup.minhashIndexBuild]]'s state: every maintenance step writes a
  * NEW version directory (`dir/v=N`) instead of overwriting the one
  * being read, readers pin a version (or take the latest committed),
  * and an append must name the EXACT predecessor version it merged
  * onto — so a lost update, a pruned base, or two concurrent
  * maintainers racing each other all fail loudly instead of silently
  * dropping merged batches from every later snapshot. Commit atomicity,
  * crash replay, race detection, and pruning live in
  * [[VersionedState]], shared with [[SemanticIndexStore]].
  *
  * Layout: `dir/v=N/index` (the `(shh, ids, sig)` frame), `dir/v=N/
  * bands` (the pre-aggregated [[Dedup.minhashIndexBands]] bucket table
  * — written together so every committed version can serve the
  * exchange-free probe, [[Dedup.minhashIndexDedupBatchBanded]]), and
  * `dir/v=N/meta` (one row: the banding parameters this version was
  * built with — numBands, rowsPerBand, maxGroupSize). [[append]]
  * validates its parameters against the base's persisted meta and
  * [[probeLatest]] probes WITH the persisted meta, so a
  * re-parameterized maintainer or a probe against a mismatched bands
  * frame fails loudly (or cannot happen) instead of silently dropping
  * candidate pairs. Longs and long arrays round-trip parquet
  * bit-exactly — a reloaded version probes identically to the
  * in-memory frame it persisted (spec-pinned,
  * `MinhashIndexStoreSpec`).
  *
  * ==Maintenance protocol==
  *  - [[init]] writes v=0 and REFUSES a directory that already holds a
  *    COMMITTED version: pointing a fresh builder at a standing index
  *    would rebuild v=0 from the new corpus alone, silently dropping
  *    it. Scratch debris from a crashed init (there is no uncommitted
  *    `v=0` under the rename protocol) does not block the retry —
  *    crash replay of init is just running init again.
  *  - [[append]]`(dir, delta, expectedBase = N)` merges onto v=N and
  *    writes v=N+1, requiring v=N to BE the latest committed version:
  *    a version above N means another maintainer already advanced the
  *    index (this caller is stale — re-read and retry on the new
  *    head); a missing v=N means the base was pruned. A crash anywhere
  *    before the rename leaves latest = N, so re-running the SAME
  *    append just succeeds — the replay rule.
  *  - [[prune]] deletes versions below a kept floor, never the head
  *    (retention policy — retain ≥ max job runtime — is the caller's).
  *
  * Scale shape: append's merge cost is the [[Dedup.minhashIndexAppend]]
  * set-keyed shuffle plus one [[Dedup.minhashIndexBands]] aggregation —
  * the amortized daily maintenance job; probes never pay it, they read
  * a pinned version's parquet frames by narrow broadcast-pruned scans
  * and join the batch against the PRE-BANDED bucket table
  * ([[Dedup.minhashIndexDedupBatchBanded]] via [[probeLatest]]), so no
  * corpus-mass row ever crosses an exchange at probe time. */
object MinhashIndexStore {

  /** The banding parameters a version was built with — persisted as
    * the version's `meta` frame and required to match across every
    * build/append/probe of one index (`numBands · rowsPerBand` is the
    * signature length). */
  final case class IndexMeta(numBands: Int, rowsPerBand: Int,
                             maxGroupSize: Int)

  /** A committed version loaded for probing: the `(shh, ids, sig)`
    * index frame, its pre-aggregated bucket table, and the banding
    * parameters both were built with. */
  final case class LoadedIndex(version: Long, index: DataFrame,
                               bands: DataFrame, meta: IndexMeta)

  private val Subframes = Seq("index", "bands", "meta")

  /** Latest committed version (all three subframes carry `_SUCCESS`),
    * or None before the first [[init]]. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    VersionedState.latestVersion(spark, dir, Subframes)

  private def writeMeta(spark: SparkSession, dest: String,
                        meta: IndexMeta): Unit = {
    import spark.implicits._
    Seq((meta.numBands, meta.rowsPerBand, meta.maxGroupSize))
      .toDF("num_bands", "rows_per_band", "max_group_size")
      .coalesce(1).write.mode("overwrite").parquet(dest)
  }

  private def readMeta(spark: SparkSession, dir: String, v: Long): IndexMeta = {
    val r = spark.read.parquet(s"$dir/v=$v/meta")
      .select("num_bands", "rows_per_band", "max_group_size").head()
    IndexMeta(r.getInt(0), r.getInt(1), r.getInt(2))
  }

  private[graft] def commitVersion(index: DataFrame, dir: String, v: Long,
                                   meta: IndexMeta): Unit = {
    val spark = index.sparkSession
    VersionedState.commitVersion(spark, dir, v, "minhash index",
      Subframes) { scratch =>
      index.write.mode("overwrite").parquet(s"$scratch/index")
      Dedup.minhashIndexBands(
        spark.read.parquet(s"$scratch/index"),
        meta.numBands, meta.rowsPerBand, meta.maxGroupSize)
        .write.mode("overwrite").parquet(s"$scratch/bands")
      writeMeta(spark, s"$scratch/meta", meta)
    }
  }

  /** Write the initial version (v=0) of a new index. Refuses a
    * directory that already holds a COMMITTED version — rebuilding a
    * standing index from a new corpus alone must be an explicit
    * delete-and-recreate, never an accident of pointing a fresh job at
    * the wrong path. A crashed earlier init leaves only scratch debris
    * (never a partial `v=0` — the rename protocol), so replaying init
    * after a crash just succeeds. Returns the version written (0). */
  def init(index: DataFrame, dir: String,
           numBands: Int = Dedup.DefaultNumBands,
           rowsPerBand: Int = Dedup.DefaultRowsPerBand,
           maxGroupSize: Int = Dedup.DefaultMaxGroupSize): Long = {
    val spark = index.sparkSession
    val (fs, path) = VersionedState.fsPath(spark, dir)
    val existing = VersionedState.versions(fs, path)
      .filter(VersionedState.committed(fs, dir, _, Subframes))
    require(existing.isEmpty,
      s"minhash index at $dir already holds committed versions " +
        s"(${existing.sorted.map("v=" + _).mkString(",")}) — init would " +
        "rebuild it from the new corpus alone, silently dropping the " +
        "standing index; append onto the latest version, or explicitly " +
        "delete the directory to start over")
    commitVersion(index, dir, 0L,
      IndexMeta(numBands, rowsPerBand, maxGroupSize))
    0L
  }

  /** Merge a delta index ([[Dedup.minhashIndexBuild]] over the new
    * batch, built with the SAME banding parameters) onto version
    * `expectedBase` and write version `expectedBase + 1`. The base must
    * be the LATEST COMMITTED version — see the protocol above — and the
    * caller's parameters must equal the base's persisted meta: a
    * re-parameterized delta would band differently than the standing
    * index and silently drop candidate pairs, so the mismatch fails by
    * name instead. Returns the version written. */
  def append(spark: SparkSession, dir: String, delta: DataFrame,
             expectedBase: Long,
             numBands: Int = Dedup.DefaultNumBands,
             rowsPerBand: Int = Dedup.DefaultRowsPerBand,
             maxGroupSize: Int = Dedup.DefaultMaxGroupSize): Long = {
    val latest = latestVersion(spark, dir)
    require(latest.contains(expectedBase),
      s"minhash index at $dir: append expected base v=$expectedBase but the " +
        s"latest committed version is ${latest.map("v=" + _).getOrElse("<none>")} — " +
        (latest match {
          case Some(l) if l > expectedBase =>
            "another maintainer already advanced the index; re-read the head " +
              "and retry the append on it (applying this delta here would " +
              "silently drop the newer versions' merges)"
          case Some(_) =>
            "the expected base was never committed (crashed append?); retry " +
              "from the committed head"
          case None =>
            "the base was pruned or the index was never initialized — a " +
              "merge onto an empty base would silently drop every " +
              "previously indexed document"
        }))
    val baseMeta = readMeta(spark, dir, expectedBase)
    val callerMeta = IndexMeta(numBands, rowsPerBand, maxGroupSize)
    require(baseMeta == callerMeta,
      s"minhash index at $dir: append parameters $callerMeta do not match " +
        s"v=$expectedBase's persisted $baseMeta — a delta banded with " +
        "different parameters would silently drop candidate pairs; rebuild " +
        "the index to re-parameterize")
    val merged = Dedup.minhashIndexAppend(
      spark.read.parquet(s"$dir/v=$expectedBase/index"), delta, maxGroupSize)
    commitVersion(merged, dir, expectedBase + 1, baseMeta)
    expectedBase + 1
  }

  /** Delete versions strictly below `keepFrom` (plus crash debris below
    * it). Never prunes the latest committed version; the retention
    * window — retain ≥ the max expected reader/appender runtime — is
    * the caller's policy. Returns the pruned version numbers. */
  def prune(spark: SparkSession, dir: String, keepFrom: Long): Seq[Long] =
    VersionedState.prune(spark, dir, keepFrom, Subframes, "minhash index")

  /** Load a pinned version — or the latest committed version when
    * `version` is None — as its `(index, bands, meta)` triple. A pinned
    * version that is missing or uncommitted fails by name (reading it
    * as parquet would either error opaquely or, with an explicit
    * schema, silently return 0 rows — an empty index "finds" no
    * duplicates). */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): LoadedIndex = {
    val (fs, _) = VersionedState.fsPath(spark, dir)
    val v = version match {
      case Some(p) =>
        require(VersionedState.committed(fs, dir, p, Subframes),
          s"minhash index at $dir has no committed version v=$p " +
            s"(latest committed: ${latestVersion(spark, dir).map("v=" + _)
              .getOrElse("<none>")})")
        p
      case None =>
        latestVersion(spark, dir).getOrElse(
          throw new IllegalArgumentException(
            s"minhash index at $dir has no committed version"))
    }
    LoadedIndex(v, spark.read.parquet(s"$dir/v=$v/index"),
      spark.read.parquet(s"$dir/v=$v/bands"), readMeta(spark, dir, v))
  }

  /** The production probe entry point: dedup `batch` against the
    * latest committed version (or a pinned one) through the
    * exchange-free banded path, USING THE PERSISTED banding parameters
    * — the probe cannot be mis-parameterized against the bands frame
    * it reads. `shingleK`, the threshold family, and the valve are
    * per-probe choices and stay with the caller. */
  def probeLatest(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  shingleK: Int = Dedup.DefaultShingleK,
                  threshold: Double = 0.5,
                  prefilterMargin: Double = 0.25,
                  minPairBands: Int = 1,
                  version: Option[Long] = None): DataFrame = {
    val loaded = read(spark, dir, version)
    Dedup.minhashIndexDedupBatchBanded(loaded.index, loaded.bands, batch,
      idCol, textCol, shingleK, loaded.meta.numBands,
      loaded.meta.rowsPerBand, threshold, prefilterMargin, minPairBands,
      loaded.meta.maxGroupSize)
  }
}
