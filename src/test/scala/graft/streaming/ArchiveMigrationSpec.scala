package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, length, lit}
import graft.SparkSpec

/** Specs for [[AcceptedSink.migrateArchive]] — the schema-evolution
  * policy's explicit escape hatch: add/drop/retype migrations rewrite
  * the archive in one receipt-verifiable atomic operation, as-of reads
  * stay exact across the boundary, takedown survives the rewrite, and
  * everything a migration must not touch (rows, the `batch` pin, the
  * tombstoned id column) refuses by name. */
class ArchiveMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(ids: Long*): DataFrame =
    ids.map(i => (i, s"doc $i", "web")).toDF("doc_id", "text", "src")

  private def writeBatch(dir: String, b: Long, df: DataFrame): Unit =
    df.coalesce(1).write.parquet(s"$dir/batch=$b")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("archive-mig").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  private def ids(dir: String): Set[Long] =
    AcceptedSink.readAccepted(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  /** Two folded generations: batches 0,1 in archive v0; batch 2 in v1. */
  private def folded(acc: String): Unit = {
    writeBatch(acc, 0L, batchDf(1L, 2L))
    writeBatch(acc, 1L, batchDf(3L))
    assert(AcceptedSink.fold(spark, acc, belowBatch = 2L) === Some(1L))
    writeBatch(acc, 2L, batchDf(4L, 5L))
    assert(AcceptedSink.fold(spark, acc, belowBatch = 3L) === Some(2L))
  }

  test("ADD migration: backfilled column lands, schema authority moves, receipt verifies, as-of pinned") {
    withDir { acc =>
      folded(acc)
      val asOf0 = AcceptedSink.readAcceptedAsOf(spark, acc, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val o = AcceptedSink.migrateArchive(spark, acc,
        _.withColumn("n_chars", length(col("text")).cast("long")))
      assert(o === AcceptedSink.MigrationOutcome(1L, 2L, 5L, 3L))
      // the new head supersedes the old chain whole (full version)
      assert(AcceptedSink.archiveChain(spark, acc) === Seq(2L))
      // every historical row carries the backfill; the batch pin held
      val out = AcceptedSink.readAccepted(spark, acc)
        .select("doc_id", "batch", "n_chars").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set((1L, 0L, 5L), (2L, 0L, 5L), (3L, 1L, 5L),
        (4L, 2L, 5L), (5L, 2L, 5L)))
      // as-of reads across the migration boundary are EXACT
      assert(AcceptedSink.readAcceptedAsOf(spark, acc, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet === asOf0)
      // the standing schema is now the migrated one: the old batch
      // shape is refused (DROPS the new column), the new shape passes
      assert(AcceptedSink.acceptedSchema(spark, acc).get.fieldNames.sorted
        === Array("doc_id", "n_chars", "src", "text"))
      val msg = intercept[IllegalArgumentException](
        AcceptedSink.requireSchemaCompatible(spark, acc, batchDf(6L)))
        .getMessage
      assert(msg.contains("DROPS") && msg.contains("n_chars"), msg)
      AcceptedSink.requireSchemaCompatible(spark, acc,
        batchDf(6L).withColumn("n_chars", lit(9L)))
      // the receipt rode the commit: counts and both schemas on record
      val r = AcceptedSink.migrationReceipt(spark, acc, 2L).get.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 5L, 3L)))
      assert(!r.getString(3).contains("n_chars") &&
        r.getString(4).contains("n_chars"))
      // fold/compact versions carry no receipt
      assert(AcceptedSink.migrationReceipt(spark, acc, 1L).isEmpty)
      // the superseded chain prunes away; the corpus still answers
      assert(AcceptedSink.prune(spark, acc, keepFrom = 2L).sorted
        === Seq(0L, 1L))
      assert(ids(acc) === Set(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("DROP and RETYPE migrations (no standing tombstones): both land; ingest continues on the new schema") {
    withDir { acc =>
      folded(acc)
      AcceptedSink.migrateArchive(spark, acc, _.drop("src"))
      assert(AcceptedSink.acceptedSchema(spark, acc).get.fieldNames.sorted
        === Array("doc_id", "text"))
      AcceptedSink.migrateArchive(spark, acc,
        _.withColumn("doc_id", col("doc_id").cast("int")))
      assert(AcceptedSink.acceptedSchema(spark, acc).get("doc_id")
        .dataType.simpleString === "int")
      // the migrated archive keeps folding new (migrated-shape) batches
      writeBatch(acc, 3L, Seq((6, "doc 6")).toDF("doc_id", "text"))
      assert(AcceptedSink.fold(spark, acc, belowBatch = 4L) === Some(3L))
      assert(AcceptedSink.readAccepted(spark, acc)
        .select("doc_id").collect().map(_.getInt(0)).toSet
        === Set(1, 2, 3, 4, 5, 6))
    }
  }

  test("takedown survives the rewrite; id-touching and row-filtering migrations refuse by name") {
    withDir { acc =>
      folded(acc)
      AcceptedSink.remove(spark, acc, Seq(2L).toDF("doc_id"), "doc_id")
      assert(ids(acc) === Set(1L, 3L, 4L, 5L))
      // the migration carries the tombstone forward: 2 stays withdrawn
      AcceptedSink.migrateArchive(spark, acc,
        _.withColumn("lang", lit("en")))
      assert(ids(acc) === Set(1L, 3L, 4L, 5L))
      assert(AcceptedSink.liveTombs(spark, acc).get
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
      def refused(mig: DataFrame => DataFrame): String =
        intercept[IllegalArgumentException](
          AcceptedSink.migrateArchive(spark, acc, mig)).getMessage
      // dropping, retyping, or REWRITING the tombstoned id column would
      // orphan the takedown — each refuses naming the column
      val drop = refused(_.drop("doc_id"))
      assert(drop.contains("doc_id") && drop.contains("tombstones"), drop)
      val retype = refused(_.withColumn("doc_id", col("doc_id").cast("int")))
      assert(retype.contains("doc_id") && retype.contains("tombstones"), retype)
      val rewrite = refused(_.withColumn("doc_id", col("doc_id") + 1000L))
      assert(rewrite.contains("rewrote") && rewrite.contains("doc_id"), rewrite)
      // a row filter is not a migration
      val filtered = refused(_.where(col("doc_id") =!= 3L))
      assert(filtered.contains("row counts") && filtered.contains("batch 1"),
        filtered)
      // dropping the as-of pin is not a migration
      val nobatch = refused(_.drop("batch"))
      assert(nobatch.contains("`batch`"), nobatch)
      // every refusal left the archive serving the last good state
      assert(ids(acc) === Set(1L, 3L, 4L, 5L))
      assert(AcceptedSink.readAccepted(spark, acc).columns.contains("lang"))
    }
  }

  test("a live tier above the watermark refuses the migration; pre-archive sinks have nothing to migrate") {
    withDir { acc =>
      folded(acc)
      writeBatch(acc, 3L, batchDf(7L))
      val msg = intercept[IllegalArgumentException](
        AcceptedSink.migrateArchive(spark, acc, _.drop("src"))).getMessage
      assert(msg.contains("batch=3") && msg.contains("fold"), msg)
      val fresh = s"$acc-fresh"
      writeBatch(fresh, 0L, batchDf(1L))
      val msg2 = intercept[IllegalStateException](
        AcceptedSink.migrateArchive(spark, fresh, _.drop("src"))).getMessage
      assert(msg2.contains("no archive"), msg2)
    }
  }
}
