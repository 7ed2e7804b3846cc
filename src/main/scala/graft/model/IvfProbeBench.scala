package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the partition-pruned IVF store probe against the
  * full-scan probe over the SAME persisted index — the runnable form
  * of the [[graft.ops.IvfIndexStore]] I/O claim: with the cell frame
  * written `partitionBy(cell)` and the batch's touched cells applied
  * as a static partition filter, the probe reads ~nprobe/nlist of the
  * corpus bytes, so its wall time should grow with the touched cells'
  * mass while the full-scan probe grows with the whole corpus.
  *
  * Usage: `runMain graft.model.IvfProbeBench [sfDir [replication]]`
  * (default `SPARK_GRAFT_SF_DIR`, replication 100). The `embeddings`
  * table is replicated `replication`× with distinct ids (same vectors
  * — cell geometry is unchanged, only mass grows), a store is built at
  * nlist=256, and a fixed 8-query batch is probed at nprobe=4
  * (median of 3, one warm-up) through (a) `probeLatest` (pruned scan)
  * and (b) `Similarity.ivfProbe` over the full reloaded cell frame.
  * Result sets are asserted equal row-for-row — pruning must be
  * invisible to the answer. Prints one JSON line; run at two
  * replications to read each probe's corpus-size term directly. */
object IvfProbeBench {
  import BenchHarness.{median, time}

  def main(args: Array[String]): Unit = {
    import graft.ops.{IvfIndexStore, Similarity}
    val (spark, dir) = BenchHarness.session(args, "/root/testdata/sf0.1")
    val replication = args.drop(1).headOption.map(_.toInt).getOrElse(100)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.crossJoin(spark.range(replication).as("rep"))
      .select((col("vec_id") * replication + col("id")).as("vec_id"),
        col("embedding"))
    // negative query ids can never collide with the replicated corpus
    // ids (vec_id * replication + rep, all non-negative), so the
    // self-pair exclusion and the pruned/full parity checks stay sound
    // at any replication factor
    val queries = emb.orderBy("vec_id").limit(8)
      .select((-(col("vec_id") + 1L)).as("vec_id"), col("embedding"))
    val store = java.nio.file.Files.createTempDirectory("ivf-bench").toString
    try {
      val (buildSec, _) = time {
        IvfIndexStore.init(corpus, store, "vec_id", "embedding", nlist = 256)
        0L
      }
      def clearAll(): Unit = spark.catalog.clearCache()
      // bytes each probe reads off the cells layout — the number that
      // actually scales: wall time at local[32] over page-cached
      // megabytes is overhead-dominated, but the byte ratio IS the
      // claim (touched cells / nlist of the corpus) at any scale. The
      // pruned scan reads exactly the touched cell directories
      // (partition filter, plan-spec-pinned in IvfIndexStoreSpec), so
      // the directory sizes are the scan's input bytes.
      def dirBytes(f: java.io.File): (Long, Long) =
        BenchHarness.dirFilesBytes(f)
      val (prunedSec, prunedRows) = median {
        clearAll()
        IvfIndexStore.probeLatest(spark, store, queries,
          "vec_id", "embedding", k = 10, nprobe = 4).count()
      }
      val loaded = IvfIndexStore.read(spark, store)
      val touched = Similarity.ivfProbeCells(queries, "embedding",
        loaded.centroids, nprobe = 4)
      val cellsRoot = s"$store/v=${loaded.version}/cells"
      val (prunedFiles, prunedBytes) = touched
        .map(c => dirBytes(new java.io.File(s"$cellsRoot/cell=$c")))
        .foldLeft((0L, 0L)) { case ((nf, nb), (f2, b2)) => (nf + f2, nb + b2) }
      val (fullFiles, fullBytes) = dirBytes(new java.io.File(cellsRoot))
      val (fullSec, fullRows) = median {
        clearAll()
        Similarity.ivfProbe(loaded.centroids, loaded.cells, queries,
          "vec_id", "embedding", k = 10, nprobe = 4).count()
      }
      require(prunedRows == fullRows,
        s"probe disagreement: pruned=$prunedRows full=$fullRows")
      // row-for-row, not just count: pruning must not change the answer
      val diff = IvfIndexStore.probeLatest(spark, store, queries,
          "vec_id", "embedding", k = 10, nprobe = 4)
        .exceptAll(Similarity.ivfProbe(loaded.centroids, loaded.cells,
          queries, "vec_id", "embedding", k = 10, nprobe = 4)).count()
      require(diff == 0L, s"pruned probe answers differently: $diff rows")
      println(
        s"""{"dir":"$dir","replication":$replication,""" +
        s""""corpus_rows":${corpus.count()},"probe_rows":$prunedRows,""" +
        s""""build_init_sec":$buildSec,"pruned_probe_sec":$prunedSec,""" +
        s""""full_scan_probe_sec":$fullSec,""" +
        s""""pruned_files":$prunedFiles,"pruned_bytes":$prunedBytes,""" +
        s""""full_files":$fullFiles,"full_bytes":$fullBytes}""")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(store)).deleteRecursively()
      spark.stop()
    }
  }
}
