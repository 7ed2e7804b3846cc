package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.pipeline.Cdc

/** Streaming leg of the CDC MERGE pattern: fold a change stream
  * (key, payload, op ∈ I/U/D, seq) into a maintained parquet snapshot,
  * one [[Cdc.applyChanges]] merge per micro-batch via foreachBatch.
  *
  * Snapshot layout is versioned — `dir/v=<batchId>` — because
  * overwriting the directory being read is unsafe (lazy reads would
  * consume their own overwrite) and because foreachBatch replays a
  * batchId after failure: writing to `v=<batchId>` makes the replay an
  * idempotent overwrite of the same version instead of a double-apply.
  * Readers take the max version ([[readSnapshot]]); stale versions are
  * pruneable like any small-file maintenance
  * ([[graft.pipeline.Compaction]] territory) — under the retention
  * contract below.
  *
  * ==Pruning contract==
  * A pruner may delete `v=*` directories EXCEPT:
  *  1. the newest committed version N (readers resolve to it), and
  *  2. its predecessor, until batch N's CHECKPOINT commit is durable
  *     (`<checkpoint>/commits/N` exists) — a crash between the v=N
  *     write and the checkpoint commit replays batch N on restart, and
  *     the replay must merge onto the same base it saw the first time.
  *     A snapshot version carrying its _SUCCESS marker does NOT mean
  *     the batch committed; only the checkpoint says that.
  *  3. While an external query is running against version V, V must be
  *     outlive the query (plain parquet has no reader snapshot pin —
  *     operationally: retain ≥ the max expected reader runtime).
  * Violating (2) is detected, not absorbed: the base guard in
  * [[applyChangesSink]] fails the replayed batch loudly ("pruned base
  * or stale checkpoint") rather than merging onto an empty base and
  * silently dropping every previously merged key. Spec-pinned in
  * StreamingSpec ("prune-during-replay"). The dir also carries an
  * owner stamp (`_owner_checkpoint`, written at batch 0 — the pruner
  * must retain it) binding the snapshot to its checkpoint: batch 0 of
  * a DIFFERENT checkpoint against a non-empty snapshot is refused,
  * closing the one state (existing=[0], batchId=0) that version
  * numbers alone cannot distinguish from a legitimate batch-0 replay.
  *
  * Scale shape: per micro-batch work is one changeset shuffle plus an
  * anti-join against the snapshot (the snapshot is never shuffled —
  * [[Cdc.applyChanges]]'s contract), then one snapshot write. At a
  * 100 TB snapshot the full-rewrite-per-batch becomes the bottleneck;
  * the step up is partition-pruned rewrites (only partitions containing
  * changed keys — the incremental partition-overwrite sink) or a
  * log-structured table format. The merge semantics stay exactly this. */
object CdcStream {

  private val VersionRe = "v=(\\d+)".r

  /** Snapshot-to-checkpoint binding stamp (`dir/_owner_checkpoint`):
    * written once at batch 0, holding the owning checkpoint location.
    * Closes the one hole version numbers alone can't see — a FRESH
    * checkpoint pointed at a snapshot holding only v=0 presents
    * exactly like a legitimate batch-0 crash replay (both arrive with
    * batchId=0 and existing=[0]), and would silently rebuild v=0 from
    * an empty base. The stamp disambiguates: replay carries the same
    * checkpoint location; a new checkpoint doesn't. Compared as the
    * string passed to [[applyChangesSink]] — spell the location the
    * same way across restarts. */
  private val OwnerMarker = "_owner_checkpoint"

  private def fsPath(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Hadoop-FS listing, not java.io — snapshot dirs live on whatever
    * filesystem the session writes to (HDFS/S3/local alike). */
  private def versions(fs: org.apache.hadoop.fs.FileSystem,
                       path: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }

  /** Latest COMMITTED snapshot version in `dir` (has its _SUCCESS
    * marker), or None before the first batch. The marker check keeps a
    * concurrent reader off the version the stream is mid-writing — an
    * uncommitted dir read with an explicit schema would silently
    * return 0 rows instead of erroring. (While a failure REPLAY is
    * rewriting version N, its marker is briefly absent and readers
    * fall back to N-1 — stale-but-consistent, never partial.) */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, path) = fsPath(spark, dir)
    versions(fs, path).sorted.reverse.find { v =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v/_SUCCESS"))
    }
  }

  /** Read the current snapshot (empty frame with `schema` if none). */
  def readSnapshot(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.schema(schema).parquet(s"$dir/v=$v")
      case None    => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def readOwner(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  private def writeOwner(fs: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path, owner: String): Unit = {
    val out = fs.create(p, true)
    try out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Start the snapshot maintainer. `changes` must be a streaming frame
    * whose columns are the snapshot columns plus `seqCol` and `opCol`. */
  def applyChangesSink(changes: DataFrame, snapshotDir: String, keys: Seq[String],
                       seqCol: String, opCol: String,
                       checkpointDir: String): StreamingQuery = {
    val baseSchema = StructType(changes.schema.filterNot(f =>
      f.name == seqCol || f.name == opCol))
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // base = newest version BELOW this batchId (a replayed batch must
        // merge onto the same base it saw the first time, not onto its
        // own partial output)
        val (fs, snapPath) = fsPath(spark, snapshotDir)
        val existing = versions(fs, snapPath)
        // batch 0 is where version numbers can't tell a crash REPLAY
        // (same checkpoint, overwrite of v=0 is idempotent and legal)
        // from a FRESH checkpoint pointed at an existing snapshot
        // (existing=[0] passes every numeric check, then merges onto an
        // empty base) — the owner stamp decides
        if (batchId == 0L) {
          val marker = new org.apache.hadoop.fs.Path(s"$snapshotDir/$OwnerMarker")
          readOwner(fs, marker) match {
            case Some(owner) =>
              require(owner == checkpointDir,
                s"snapshot $snapshotDir is owned by checkpoint '$owner' but batch 0 " +
                  s"arrived from checkpoint '$checkpointDir' — a fresh checkpoint " +
                  "pointed at an existing snapshot would silently rebuild it from an " +
                  "empty base; start with an empty snapshot dir or restore the " +
                  "original checkpoint")
            case None =>
              require(existing.isEmpty,
                s"snapshot $snapshotDir has versions (${existing.sorted.mkString(",")}) " +
                  "but no owner stamp, and batch 0 arrived from checkpoint " +
                  s"'$checkpointDir' — refusing to rebuild an existing snapshot from " +
                  "an empty base; start with an empty snapshot dir or restore the " +
                  "original checkpoint")
              writeOwner(fs, marker, checkpointDir)
          }
        }
        // legal states for batch b: every existing version ≤ b (== b
        // only from this batch's own crashed write), and for b > 0 the
        // base must be EXACTLY v=b-1 — batch ids are consecutive and
        // every batch writes its own version, so the predecessor is the
        // only base this batch can ever have legally merged onto. A
        // version ABOVE b means a fresh checkpoint was pointed at an
        // existing snapshot dir. A missing predecessor means a pruner
        // violated retention rule (2) — and accepting any OLDER
        // surviving version instead would silently drop the pruned
        // batches' merges from every later snapshot, which is exactly
        // the absorption the contract promises to detect.
        require(existing.forall(_ <= batchId) &&
            (batchId == 0 || existing.contains(batchId - 1)),
          s"snapshot versions in $snapshotDir (${existing.sorted.mkString(",")}) " +
            s"are inconsistent with batch $batchId (required base: " +
            s"v=${math.max(batchId - 1, 0)}): pruned base or stale checkpoint?")
        val base =
          if (batchId == 0)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
          else
            spark.read.schema(baseSchema)
              .parquet(s"$snapshotDir/v=${batchId - 1}")
        Cdc.applyChanges(base, batch, keys, seqCol, opCol)
          .write.mode("overwrite").parquet(s"$snapshotDir/v=$batchId")
        (): Unit
      }
      .start()
  }
}
