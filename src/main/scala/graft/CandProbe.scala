package graft
import org.apache.spark.sql.functions._
object CandProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.optimizer.excludedRules", EngineConf.ExcludedOptimizerRules)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val docs = graft.model.Tables.load(spark, args(0), "documents")
    val hashed = Dedup.shingleHashed(docs, "doc_id", "text", 5)
      .select(col("id"), array_distinct(col("shh")).as("shh")).cache()
    val sig = hashed.where(size(col("shh")) > 0)
      .select(col("id"), Dedup.minhashSignatureFromHashes(col("shh"), 48).as("sig")).cache()
    val banded = sig.select(col("id"),
      posexplode(array((0 until 24).map { b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * 2 + 1, 2))) }: _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("nb")).cache()
    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE-STAGE $label%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    tm("hashed(cache)")(hashed.count())
    tm("sig(cache)")(sig.count())
    tm("pairs(nb)")(pairs.count())
    val nb1 = pairs.count()
    val nb2 = pairs.where(col("nb") >= 2).count()
    val t0 = System.nanoTime
    val est = pairs.where(col("nb") >= 2)
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .where(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), x => x)) >= 12)
      .count()
    println(f"PROBE-STAGE est-screen            ${(System.nanoTime - t0) / 1e9}%8.2f s")
    val t1 = System.nanoTime
    val verified = pairs.select("id_a", "id_b")
      .join(hashed.select(col("id").as("id_a"), col("shh").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("shh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("sz_a"), size(col("sh_b")).as("sz_b"))
      .where(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")) >= 0.5)
      .count()
    println(f"PROBE-STAGE verify                ${(System.nanoTime - t1) / 1e9}%8.2f s  rows=$verified")
    println(s"PROBE dir=${args(0)} nb>=1: $nb1  nb>=2: $nb2  est-survivors: $est")
  }
}
