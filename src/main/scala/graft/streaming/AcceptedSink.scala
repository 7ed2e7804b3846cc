package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.ops.VersionedState

/** Lifecycle for the ingest loops' accepted-corpus sink — the missing
  * half of the partition-per-batch layout. The streams write each
  * micro-batch's survivors to `acceptedDir/batch=<batchId>` because the
  * per-batch overwrite is what makes crash replay idempotent — but left
  * alone that layout gains one directory per micro-batch FOREVER (a
  * year of 5-minute batches is ~105k directories of mostly tiny files:
  * a listing, footer-read, and namenode tax on every reader, the
  * small-file failure mode [[graft.pipeline.Compaction]] documents).
  *
  * The fix is a FOLD on the ingest loop's existing compaction cadence:
  * batch directories strictly below the current batch id are
  * REPLAY-DEAD (foreachBatch delivers batch N only after N−1's
  * checkpoint commit — the [[IngestProtocol.sweepLedger]] argument), so
  * [[fold]] rewrites them into one archive DELTA version and deletes
  * them. The archive lives under `acceptedDir/_archive` — the
  * underscore prefix keeps Spark's parquet reader from mixing it into a
  * raw directory scan — as a [[VersionedState]] chain (`v=N/data` +
  * `v=N/meta`), so the fold inherits the stores' commit atomicity,
  * crash replay, and chain rules instead of inventing a second
  * protocol. Each fold writes O(folded window) bytes into
  * row-mass-bounded files ([[IngestProtocol.boundedFileCount]]);
  * [[compactArchive]] folds the archive chain itself into one full
  * version on the operator's deeper cadence (O(accepted corpus), the
  * same class as a table OPTIMIZE — schedule it accordingly);
  * directory growth drops from one per BATCH to one per CADENCE TRIP,
  * and after an archive compact to one per archive generation.
  *
  * ==Crash safety==
  * The archive version commits by one atomic rename BEFORE the folded
  * batch directories are deleted, and the version's meta records
  * `max_folded_batch`. The crash window between commit and deletes
  * therefore leaves DUPLICATE data on disk but never in an answer:
  * [[readAccepted]] serves live directories only ABOVE the latest
  * archive's `max_folded_batch`, and the next [[fold]] deletes
  * at-or-below-watermark directories on sight (dead debris) before
  * folding anything new. Replaying the batch that triggered a fold
  * re-runs [[fold]] with nothing foldable — a no-op.
  *
  * ==Reading the accepted corpus==
  * [[readAccepted]] is the read surface: the archive chain's data
  * unioned with the live batch directories above the watermark, with
  * `batch` normalized to a long DATA column in both (the live side's
  * partition column is inferred as int). A raw
  * `spark.read.parquet(acceptedDir)` stays exact only until the first
  * fold. */
object AcceptedSink {

  private[streaming] val ArchiveName = "_archive"
  private val Subframes = Seq("data", "meta")
  private val MetaCols = Seq("max_folded_batch", "full")
  private val BatchDirRe = "batch=(\\d+)".r

  private def archiveRoot(acceptedDir: String): String =
    s"$acceptedDir/$ArchiveName"

  private def liveBatches(spark: SparkSession,
                          acceptedDir: String): Seq[Long] = {
    val (fs, path) = VersionedState.fsPath(spark, acceptedDir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .collect { case BatchDirRe(b) => b.toLong }
  }

  private def readMetaRow(spark: SparkSession, root: String,
                          v: Long): (Long, Boolean) = {
    val mdf = spark.read.parquet(s"$root/v=$v/meta")
    VersionedState.requireMetaCols(mdf.columns, MetaCols,
      s"accepted archive at $root v=$v")
    val r = mdf.select(MetaCols.head, MetaCols.tail: _*).head()
    (r.getLong(0), r.getBoolean(1))
  }

  private def chain(spark: SparkSession, root: String, v: Long): Seq[Long] =
    VersionedState.chain(spark, root, v, Subframes, "accepted archive")(
      readMetaRow(spark, root, _)._2)

  /** The fold watermark: every batch directory at or below it is
    * archived (or dead debris). None before the first fold. */
  def maxFoldedBatch(spark: SparkSession,
                     acceptedDir: String): Option[Long] = {
    val root = archiveRoot(acceptedDir)
    VersionedState.latestVersion(spark, root, Subframes)
      .map(readMetaRow(spark, root, _)._1)
  }

  /** Fold every replay-dead live batch directory (id above the current
    * watermark, strictly below `belowBatch`) into one new archive delta
    * version, then delete the folded directories — O(folded window)
    * read+write, row-mass-bounded output files. Directories at or below
    * the watermark are deleted WITHOUT reading (dead debris of a fold
    * that crashed between its commit and its deletes). Returns the new
    * watermark, or None when nothing was foldable (including a replay
    * of the batch that already folded). */
  def fold(spark: SparkSession, acceptedDir: String,
           belowBatch: Long): Option[Long] = {
    val root = archiveRoot(acceptedDir)
    val (fs, _) = VersionedState.fsPath(spark, acceptedDir)
    val watermark = maxFoldedBatch(spark, acceptedDir)
    val live = liveBatches(spark, acceptedDir)
    watermark.foreach { w =>
      live.filter(_ <= w).foreach(b => fs.delete(
        new org.apache.hadoop.fs.Path(s"$acceptedDir/batch=$b"), true))
    }
    val foldable = live
      .filter(b => watermark.forall(b > _) && b < belowBatch).sorted
    if (foldable.isEmpty) None
    else {
      val newMax = foldable.max
      // the batch partition value becomes a DATA column — the folded
      // rows must answer "which batch accepted this doc" exactly as the
      // live layout did
      val data = foldable.map { b =>
        spark.read.parquet(s"$acceptedDir/batch=$b")
          .withColumn("batch", lit(b))
      }.reduce(_ unionByName _)
      val rows = data.count()
      val head = VersionedState.latestVersion(spark, root, Subframes)
      val v = head.map(_ + 1).getOrElse(0L)
      VersionedState.commitVersion(spark, root, v, "accepted archive",
        Subframes) { scratch =>
        // coalesce, not repartition: the fold's lineage is a plain
        // multi-file scan, so merging splits costs no shuffle; fold
        // mass is one cadence window, so the collapsed parallelism is
        // batch-scale, not corpus-scale
        data.coalesce(IngestProtocol.boundedFileCount(rows))
          .write.mode("overwrite").parquet(s"$scratch/data")
        writeMeta(spark, s"$scratch/meta", newMax, full = head.isEmpty)
      }
      foldable.foreach(b => fs.delete(
        new org.apache.hadoop.fs.Path(s"$acceptedDir/batch=$b"), true))
      Some(newMax)
    }
  }

  private def writeMeta(spark: SparkSession, dest: String, maxFolded: Long,
                        full: Boolean): Unit = {
    import spark.implicits._
    Seq((maxFolded, full)).toDF(MetaCols: _*)
      .coalesce(1).write.mode("overwrite").parquet(dest)
  }

  /** Fold the archive's delta chain into one FULL version — the deeper
    * consolidation pass, O(accepted corpus) like any table OPTIMIZE;
    * schedule it on the operator's cadence (monthly, or when the
    * archive chain length starts to show in reader listing times), then
    * [[prune]] reclaims the folded versions. No-op (returns the head)
    * when the head is already full; None when no archive exists yet. */
  def compactArchive(spark: SparkSession,
                     acceptedDir: String): Option[Long] = {
    val root = archiveRoot(acceptedDir)
    VersionedState.latestVersion(spark, root, Subframes).map { head =>
      val (maxFolded, full) = readMetaRow(spark, root, head)
      if (full) head
      else {
        val links = chain(spark, root, head)
        val data = links.map(w => spark.read.parquet(s"$root/v=$w/data"))
          .reduce(_ unionByName _)
        val rows = data.count()
        VersionedState.commitVersion(spark, root, head + 1,
          "accepted archive", Subframes) { scratch =>
          data.coalesce(IngestProtocol.boundedFileCount(rows))
            .write.mode("overwrite").parquet(s"$scratch/data")
          writeMeta(spark, s"$scratch/meta", maxFolded, full = true)
        }
        head + 1
      }
    }
  }

  /** Delete archive versions below `keepFrom`'s chain base — the
    * stores' prune, applied to the archive chain. */
  def prune(spark: SparkSession, acceptedDir: String,
            keepFrom: Long): Seq[Long] =
    VersionedState.pruneToChainBase(spark, archiveRoot(acceptedDir),
      keepFrom, Subframes, "accepted archive")(
      readMetaRow(spark, archiveRoot(acceptedDir), _)._2)

  /** The whole accepted corpus — archive chain plus live batch
    * directories above the watermark — with `batch` as a long column in
    * both tiers. Exact across every fold/crash window (see the object
    * doc); equal to a raw `spark.read.parquet(acceptedDir)` until the
    * first fold. Fails by name on a directory with neither tier (an
    * empty union has no schema to offer). */
  def readAccepted(spark: SparkSession, acceptedDir: String): DataFrame = {
    val root = archiveRoot(acceptedDir)
    val archived = VersionedState.latestVersion(spark, root, Subframes)
      .map { head =>
        val links = chain(spark, root, head)
        (links.map(w => spark.read.parquet(s"$root/v=$w/data"))
          .reduce(_ unionByName _), readMetaRow(spark, root, head)._1)
      }
    val watermark = archived.map(_._2)
    val liveDirs = liveBatches(spark, acceptedDir)
      .filter(b => watermark.forall(b > _))
    val live =
      if (liveDirs.isEmpty) None
      else Some(spark.read.parquet(acceptedDir)
        .where(watermark.map(w => col("batch") > w).getOrElse(lit(true)))
        .withColumn("batch", col("batch").cast("long")))
    (archived.map(_._1), live) match {
      case (Some(a), Some(l)) => a.unionByName(l)
      case (Some(a), None) => a
      case (None, Some(l)) => l
      case (None, None) => throw new IllegalArgumentException(
        s"accepted corpus at $acceptedDir: no archive and no live batch " +
          "directories — nothing has been accepted here (or the path is " +
          "wrong)")
    }
  }
}
