package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Specs for the training-shard export ([[Curation.exportShards]]) —
  * the pipeline's last mile. Pins the properties the manifest claims:
  * exactly-once row coverage across shards, the deterministic shard
  * arithmetic, within-shard training order on the BYTES (not the
  * plan), and run-to-run / partitioning-invariant determinism. */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")

  private def withDir(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try body(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("every row lands in exactly one shard, at its computed assignment") {
    withDir { root =>
      val df = docs(500)
      Curation.exportShards(df, "doc_id", 8, root)
      val back = spark.read.parquet(s"$root/data")
      assert(back.count() === 500L)
      assert(back.select("doc_id").distinct().count() === 500L)
      // on-disk shard == the pure-function assignment, for every row
      assert(back.where(col("shard") =!=
        pmod(Curation.shuffleKey(col("doc_id")), lit(8L)).cast("int"))
        .isEmpty)
      // manifest totals cover the corpus
      val m = spark.read.parquet(s"$root/_manifest")
      assert(m.agg(sum("n_rows")).head.getLong(0) === 500L)
      assert(m.count() === 8L, "500 md5-spread rows hit all 8 shards")
    }
  }

  test("within a shard the written bytes are in deterministic training order") {
    withDir { root =>
      Curation.exportShards(docs(400), "doc_id", 4, root)
      (0 until 4).foreach { s =>
        val rows = spark.read.parquet(s"$root/data/shard=$s")
          .select("shuffle_key", "doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(rows === rows.sorted,
          s"shard $s must be written sorted by (shuffle_key, id)")
      }
    }
  }

  test("the export is deterministic across runs and input partitionings") {
    withDir { root =>
      val df = docs(300)
      def manifest(out: String, d: org.apache.spark.sql.DataFrame) =
        Curation.exportShards(d, "doc_id", 8, out)
          .orderBy("shard").collect().toSeq
      val a = manifest(s"$root/a", df)
      val b = manifest(s"$root/b", df.repartition(7))
      assert(a === b, "manifests must be bit-identical across runs and " +
        "partitionings — the shuffle is a pure function of the ids")
    }
  }

  test("receipt verification: clean shards verify, a lost shard is named") {
    withDir { root =>
      Curation.exportShards(docs(200), "doc_id", 4, root)
      assert(Curation.verifyShards(spark, root, "doc_id").isEmpty,
        "a clean export must verify against its own manifest")
      // lose one shard's bytes (a failed transfer): the discrepancy
      // names the shard with nulls on the found side
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/data/shard=2"), true)
      val bad = Curation.verifyShards(spark, root, "doc_id").collect()
      assert(bad.map(_.getInt(0)).toSeq === Seq(2), bad.mkString(","))
      assert(bad.head.isNullAt(bad.head.fieldIndex("found_rows")))
    }
  }

  test("id tampering is caught by the idCol receipt, not the completeness one") {
    withDir { root =>
      Curation.exportShards(docs(60), "doc_id", 2, root)
      // forge one shard: alter every doc_id but keep the stored
      // shuffle_key column intact — the completeness receipt (stored
      // keys only) cannot see it; the idCol receipt recomputes the
      // checksum from the ids and names the shard
      val forged = spark.read.parquet(s"$root/data/shard=0")
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      val tmp = s"$root/forged"
      forged.write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/data/shard=0"), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/data/shard=0"))
      assert(Curation.verifyShards(spark, root).isEmpty,
        "the completeness-only receipt is blind to id tampering by design")
      val bad = Curation.verifyShards(spark, root, "doc_id").collect()
      assert(bad.map(_.getInt(0)).toSeq === Seq(0), bad.mkString(","))
      assert(bad.head.getLong(bad.head.fieldIndex("key_mismatches")) > 0L,
        "every forged row's stored key disagrees with the recomputed one")
    }
  }

  test("property: arbitrary ids (negative, duplicate) ship exactly-once and verify") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deliberately nasty id lists: negatives, duplicates (small range
    // forces collisions), extremes — fixed seeds, no scalatestplus
    // bridge (the PropertySpec pattern)
    val idGen = Gen.oneOf(
      Gen.chooseNum(-5L, 5L),
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    val listGen = Gen.chooseNum(1, 40).flatMap(Gen.listOfN(_, idGen))
    val lists = (0 until 6).flatMap(i =>
      listGen.apply(Gen.Parameters.default, Seed(1234L + i)))
    lists.foreach { ids =>
      withDir { root =>
        val df = ids.map(i => (i, "t")).toDF("doc_id", "text")
        val manifest = Curation.exportShards(df, "doc_id", 4, root)
        // exactly-once: total mass preserved (duplicates included)
        assert(manifest.agg(sum("n_rows")).head.getLong(0) === ids.size.toLong)
        // the manifest is the authority: only assigned shards exist
        assert(manifest.count() ===
          spark.read.parquet(s"$root/data").select("shard").distinct().count())
        assert(Curation.verifyShards(spark, root, "doc_id").isEmpty)
      }
    }
  }

  test("weighted sample equals a plain-Scala Efraimidis-Spirakis reference") {
    // the reference recomputes u (md5-prefix arithmetic), the pow key,
    // and the DECIMAL(14,12) quantization independently of Spark
    def refKey(id: Long, w: Double): BigDecimal = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 15), 16) + 1L)
        .toDouble / 1152921504606846976.0d
      BigDecimal(math.pow(u, 1.0d / w))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val rows = (1L to 300L).map(i => (i, (i % 7 + 1).toDouble))
    val expected = rows
      .map { case (id, w) => (id, refKey(id, w)) }
      .sortBy { case (id, k) => (k.unary_-, id) }
      .take(40).map(_._1).toSet
    val got = Curation.weightedSample(
      rows.toDF("doc_id", "w").repartition(5), "doc_id", col("w"), 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("weighted sample: non-positive and null weights are excluded; n covers the rest") {
    val df = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, None),
      (4L, Some(-1.0)), (5L, Some(2.0)))
      .toDF("doc_id", "w")
    val got = Curation.weightedSample(df, "doc_id", col("w"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 5L),
      "only positively-weighted rows have a sampling probability")
  }

  test("an empty corpus is refused by name") {
    withDir { root =>
      val e = intercept[IllegalArgumentException] {
        Curation.exportShards(docs(10).where(lit(false)), "doc_id", 4, root)
      }
      assert(e.getMessage.contains("empty"), e.getMessage)
    }
  }
}
