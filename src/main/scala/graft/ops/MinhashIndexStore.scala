package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned persistence for the MinHash/LSH index — the
  * [[graft.streaming.CdcStream]] snapshot protocol applied to
  * [[Dedup.minhashIndexBuild]]'s state: every maintenance step writes a
  * NEW version directory (`dir/v=N`) instead of overwriting the one
  * being read, readers pin a version (or take the latest committed),
  * and an append must name the EXACT predecessor version it merged
  * onto — so a lost update, a pruned base, or two concurrent
  * maintainers racing each other all fail loudly instead of silently
  * dropping merged batches from every later snapshot.
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
  * ==Commit protocol==
  * A version is assembled in a hidden scratch directory
  * (`dir/.tmp-v=N-<nonce>`) and COMMITTED by one atomic rename to
  * `dir/v=N`: the version directory either does not exist or is
  * complete — a crash mid-write leaves only scratch garbage (invisible
  * to [[latestVersion]]'s `v=(\d+)` filter), never a partial version.
  * Two maintainers racing the same append both pass the
  * `expectedBase` check, but only one rename can win: the loser either
  * sees the destination exist (and fails naming the race) or — on a
  * filesystem whose rename moves the source INTO an existing
  * destination directory, the HDFS semantics — detects its scratch
  * directory nested inside the winner's version, removes it, and
  * fails. Interleaved part-files in one committed directory cannot
  * happen (spec-pinned).
  *
  * ==Maintenance protocol (the CdcStream rules)==
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
  *    append just succeeds — the CdcStream replay rule.
  *  - A pruner may delete any version except the latest committed one
  *    and, while a reader/appender is running against version V, V
  *    itself (plain parquet has no snapshot pin — retain ≥ the max
  *    expected job runtime). Scratch directories older than the max
  *    job runtime are crash debris and may be pruned with it.
  *
  * Scale shape: append's merge cost is the [[Dedup.minhashIndexAppend]]
  * set-keyed shuffle plus one [[Dedup.minhashIndexBands]] aggregation —
  * the amortized daily maintenance job; probes never pay it, they read
  * a pinned version's parquet frames by narrow broadcast-pruned scans
  * and join the batch against the PRE-BANDED bucket table
  * ([[Dedup.minhashIndexDedupBatchBanded]] via [[probeLatest]]), so no
  * index-derived row ever crosses an exchange at probe time. */
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

  private val VersionRe = "v=(\\d+)".r

  private def fsPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  private def versions(fs: FileSystem, path: Path): Seq[Long] =
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }

  private def committed(fs: FileSystem, dir: String, v: Long): Boolean =
    Seq("index", "bands", "meta").forall(sub =>
      fs.exists(new Path(s"$dir/v=$v/$sub/_SUCCESS")))

  /** Latest committed version, or None before the first [[init]].
    * Scratch directories (a crashed write) don't match the version
    * pattern and are invisible; an old-protocol partial version (no
    * meta, or missing markers) is skipped: readers fall back to the
    * newest COMPLETE version — stale-but-consistent, never partial. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, path) = fsPath(spark, dir)
    versions(fs, path).sorted.reverse.find(committed(fs, dir, _))
  }

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

  /** Assemble version `v` in a scratch directory, then commit it with
    * one atomic rename — see the commit protocol above. The scratch
    * nonce derives from the JVM + a per-call counter, not wall clock
    * (two racing maintainers in one JVM still get distinct names). */
  private val scratchCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def commitVersion(index: DataFrame, dir: String, v: Long,
                                   meta: IndexMeta): Unit = {
    val spark = index.sparkSession
    val (fs, _) = fsPath(spark, dir)
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "") + "-" + scratchCounter.incrementAndGet()
    val scratchName = s".tmp-v=$v-$nonce"
    val scratch = s"$dir/$scratchName"
    val dest = new Path(s"$dir/v=$v")
    try {
      index.write.mode("overwrite").parquet(s"$scratch/index")
      Dedup.minhashIndexBands(
        spark.read.parquet(s"$scratch/index"),
        meta.numBands, meta.rowsPerBand, meta.maxGroupSize)
        .write.mode("overwrite").parquet(s"$scratch/bands")
      writeMeta(spark, s"$scratch/meta", meta)
      // the atomic commit: rename scratch → v=N, failing — and cleaning
      // up — if another maintainer committed v=N first
      def loseRace(): Nothing =
        throw new IllegalStateException(
          s"minhash index at $dir: lost the commit race for v=$v — another " +
            "maintainer committed it first; re-read the head and retry")
      // an existing COMMITTED destination is a lost race; an existing
      // UNCOMMITTED one is crash debris (an old-protocol partial write —
      // the rename protocol itself never leaves one) and is replaced,
      // which is the crash-replay rule: re-running the same append
      // overwrites the failed attempt
      if (fs.exists(dest)) {
        if (committed(fs, dir, v)) loseRace()
        fs.delete(dest, true)
      }
      if (!fs.rename(new Path(scratch), dest)) loseRace()
      // HDFS-semantics rename moves the source INTO an existing
      // destination directory instead of failing: detect the nested
      // scratch, remove it, and report the race
      val nested = new Path(dest, scratchName)
      if (fs.exists(nested)) {
        fs.delete(nested, true)
        loseRace()
      }
    } finally {
      val leftover = new Path(scratch)
      if (fs.exists(leftover)) fs.delete(leftover, true)
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
    val (fs, path) = fsPath(spark, dir)
    val existing = versions(fs, path).filter(committed(fs, dir, _))
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

  /** Load a pinned version — or the latest committed version when
    * `version` is None — as its `(index, bands, meta)` triple. A pinned
    * version that is missing or uncommitted fails by name (reading it
    * as parquet would either error opaquely or, with an explicit
    * schema, silently return 0 rows — an empty index "finds" no
    * duplicates). */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): LoadedIndex = {
    val (fs, _) = fsPath(spark, dir)
    val v = version match {
      case Some(p) =>
        require(committed(fs, dir, p),
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
