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
  * StreamingSpec ("prune-during-replay").
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

  /** Hadoop-FS listing, not java.io — snapshot dirs live on whatever
    * filesystem the session writes to (HDFS/S3/local alike). */
  private def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }
  }

  /** Latest COMMITTED snapshot version in `dir` (has its _SUCCESS
    * marker), or None before the first batch. The marker check keeps a
    * concurrent reader off the version the stream is mid-writing — an
    * uncommitted dir read with an explicit schema would silently
    * return 0 rows instead of erroring. (While a failure REPLAY is
    * rewriting version N, its marker is briefly absent and readers
    * fall back to N-1 — stale-but-consistent, never partial.) */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    versions(spark, dir).sorted.reverse.find { v =>
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
        val existing = versions(spark, snapshotDir)
        // legal states for batch b: every existing version ≤ b (== b
        // only from this batch's own crashed write), and for b > 0 a
        // base < b must exist. A version ABOVE b means a fresh
        // checkpoint was pointed at an existing snapshot dir; no base
        // below b means it was pruned. Either way, merging onto an
        // empty base would silently drop every previously merged key —
        // fail instead.
        require(existing.forall(_ <= batchId) && (batchId == 0 || existing.exists(_ < batchId)),
          s"snapshot versions in $snapshotDir (${existing.sorted.mkString(",")}) " +
            s"are inconsistent with batch $batchId: pruned base or stale checkpoint?")
        val base = existing.filter(_ < batchId)
          .sorted.lastOption match {
          case Some(v) => spark.read.schema(baseSchema).parquet(s"$snapshotDir/v=$v")
          case None    => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
        }
        Cdc.applyChanges(base, batch, keys, seqCol, opCol)
          .write.mode("overwrite").parquet(s"$snapshotDir/v=$batchId")
        (): Unit
      }
      .start()
  }
}
