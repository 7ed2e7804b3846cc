package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Layout: `dir/v=N/index` (the `(shh, ids, sig)` frame) and
  * `dir/v=N/bands` (the pre-aggregated [[Dedup.minhashIndexBands]]
  * bucket table — written together so every committed version can serve
  * the exchange-free probe, [[Dedup.minhashIndexDedupBatchBanded]]).
  * A version is COMMITTED iff both subframes carry their `_SUCCESS`
  * marker; `bands` is written last, so its marker is the commit point.
  * Longs and long arrays round-trip parquet bit-exactly — a reloaded
  * version probes identically to the in-memory frame it persisted
  * (spec-pinned).
  *
  * ==Maintenance protocol (the CdcStream rules, verbatim)==
  *  - [[init]] writes v=0 and REFUSES a directory that already holds
  *    versions: pointing a fresh builder at an existing index presents
  *    exactly like a crash replay, and absorbing it would rebuild v=0
  *    from the new corpus alone, silently dropping the standing one.
  *  - [[append]]`(dir, delta, expectedBase = N)` merges onto v=N and
  *    writes v=N+1, requiring v=N to BE the latest committed version:
  *    a version above N means another maintainer already advanced the
  *    index (this caller is stale — re-read and retry on the new head);
  *    a missing v=N means the base was pruned. A crash between the
  *    v=N+1 write and its commit marker leaves latest = N, so re-running
  *    the SAME append is an idempotent overwrite of v=N+1 — the
  *    CdcStream replay rule.
  *  - A pruner may delete any version except the latest committed one
  *    and, while a reader/appender is running against version V, V
  *    itself (plain parquet has no snapshot pin — retain ≥ the max
  *    expected job runtime).
  *
  * Scale shape: append's merge cost is the [[Dedup.minhashIndexAppend]]
  * set-keyed shuffle plus one [[Dedup.minhashIndexBands]] aggregation —
  * the amortized daily maintenance job; probes never pay it, they read
  * a pinned version's two parquet frames by narrow broadcast-pruned
  * scans. */
object MinhashIndexStore {

  private val VersionRe = "v=(\\d+)".r

  private def fsPath(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  private def versions(fs: org.apache.hadoop.fs.FileSystem,
                       path: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }

  private def committed(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                        v: Long): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v/index/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v/bands/_SUCCESS"))

  /** Latest committed version (both subframes carry `_SUCCESS`), or
    * None before the first [[init]]. An uncommitted newer directory —
    * a crashed append mid-write — is invisible: readers fall back to
    * the predecessor, stale-but-consistent, never partial. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, path) = fsPath(spark, dir)
    versions(fs, path).sorted.reverse.find(committed(fs, dir, _))
  }

  private def writeVersion(index: DataFrame, dir: String, v: Long,
                           numBands: Int, rowsPerBand: Int,
                           maxGroupSize: Int): Unit = {
    // index first, bands last: the bands _SUCCESS is the commit point,
    // so a crash between the two writes leaves the version uncommitted
    index.write.mode("overwrite").parquet(s"$dir/v=$v/index")
    Dedup.minhashIndexBands(
      index.sparkSession.read.parquet(s"$dir/v=$v/index"),
      numBands, rowsPerBand, maxGroupSize)
      .write.mode("overwrite").parquet(s"$dir/v=$v/bands")
  }

  /** Write the initial version (v=0) of a new index. Refuses a
    * directory that already holds ANY version — committed or not:
    * rebuilding an existing index from a new corpus alone must be an
    * explicit delete-and-recreate, never an accident of pointing a
    * fresh job at the wrong path. Returns the version written (0). */
  def init(index: DataFrame, dir: String,
           numBands: Int = Dedup.DefaultNumBands,
           rowsPerBand: Int = Dedup.DefaultRowsPerBand,
           maxGroupSize: Int = Dedup.DefaultMaxGroupSize): Long = {
    val spark = index.sparkSession
    val (fs, path) = fsPath(spark, dir)
    val existing = versions(fs, path)
    require(existing.isEmpty,
      s"minhash index at $dir already holds versions " +
        s"(${existing.sorted.mkString(",")}) — init would rebuild it from " +
        "the new corpus alone, silently dropping the standing index; " +
        "append onto the latest version, or explicitly delete the " +
        "directory to start over")
    writeVersion(index, dir, 0L, numBands, rowsPerBand, maxGroupSize)
    0L
  }

  /** Merge a delta index ([[Dedup.minhashIndexBuild]] over the new
    * batch) onto version `expectedBase` and write version
    * `expectedBase + 1`. The base must be the LATEST COMMITTED version
    * — see the protocol above; banding parameters must match the
    * index's. Returns the version written. */
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
    val merged = Dedup.minhashIndexAppend(
      spark.read.parquet(s"$dir/v=$expectedBase/index"), delta, maxGroupSize)
    writeVersion(merged, dir, expectedBase + 1, numBands, rowsPerBand,
      maxGroupSize)
    expectedBase + 1
  }

  /** Read a pinned version's `(index, bands)` frames — or the latest
    * committed version when `version` is None. A pinned version that is
    * missing or uncommitted fails by name (reading it as parquet would
    * either error opaquely or, with an explicit schema, silently return
    * 0 rows — an empty index "finds" no duplicates). */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): (DataFrame, DataFrame) = {
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
    (spark.read.parquet(s"$dir/v=$v/index"),
      spark.read.parquet(s"$dir/v=$v/bands"))
  }
}
