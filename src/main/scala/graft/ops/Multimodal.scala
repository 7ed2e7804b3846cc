package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The decode step itself (JPEG/WAV/MP4 → tensors) needs native codec
  * libraries that are NOT in this container — it is STUBBED with a
  * deterministic fake ([[fakeDecodeFeatures]]). Everything around the
  * stub — the asset schema, binary column handling, batched
  * `mapPartitions` execution shape, frame sampling, feature schema — is
  * real Spark plumbing and is what carries over to a production codec.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); per-row work is a narrow map (no shuffle); batch shape =
  * one partition per task, exactly how a Python `mapInPandas`/Arrow
  * pipeline would batch. Frame sampling explodes to (asset, frame) rows
  * — repartition by asset_id *before* heavy per-frame work to spread
  * skew from large videos.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = true),
      StructField("declared_format", StringType, nullable = true))), nullable = true)))

  /** Build an assets table from any source with an id and a text column —
    * the text's UTF-8 bytes stand in for an opaque media payload
    * (deterministic fake; in production this is `spark.read.format
    * ("binaryFile")` or parquet with a binary column). */
  def syntheticAssets(src: DataFrame, idCol: String, textCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("asset_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit("FAKE1").as("declared_format")))

  /** Feature schema produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("byte_max", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** STUB decode + feature-extract, batched per partition.
    *
    * A real implementation would hand `payload` bytes to a codec
    * (libjpeg/ffmpeg) here — same signature, same batching. The fake
    * computes deterministic byte statistics and a 4-bucket byte
    * histogram as the "embedding", so tests can assert exact values. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        Row.fromSeq(Seq(id) ++ fakeDecodeFeatures(bytes))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** The deterministic fake standing in for the native decoder. */
  private[ops] def fakeDecodeFeatures(bytes: Array[Byte]): Seq[Any] = {
    val n = bytes.length
    val unsigned = bytes.map(b => b & 0xff)
    val mean = if (n == 0) 0.0 else unsigned.map(_.toLong).sum.toDouble / n
    val max = if (n == 0) 0 else unsigned.max
    val hist = new Array[Double](4)
    unsigned.foreach(v => hist(v / 64) += 1.0)
    Seq(n.toLong, mean, max, hist.toSeq)
  }

  /** Frame sampling: split a payload into fixed-size "frames" (stand-in
    * for video frame extraction) and keep every `stride`-th frame.
    * Pure column ops — posexplode of payload slices, no UDF. Empty and
    * null payloads yield NO rows (posexplode of an empty array) — the
    * chunkSpans convention; a guard-forced single frame would emit a
    * self-contradictory (n_frames=0, one row) phantom. The empty-array
    * branch also covers Spark's descending-sequence trap (sequence(0,-1)
    * counts DOWN instead of being empty). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive: $frameBytes")
    require(stride > 0, s"stride must be positive: $stride")
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    assets
      .select(col("asset_id"), col("payload"), nFrames.as("n_frames"))
      .select(col("asset_id"), col("n_frames"),
        posexplode(when(col("n_frames").isNull || col("n_frames") < 1,
          array().cast("array<binary>"))
          .otherwise(transform(sequence(lit(0), col("n_frames") - 1),
            i => col("payload").substr(i * frameBytes + 1, lit(frameBytes)))))
          .as(Seq("frame_idx", "frame_payload")))
      .where(col("frame_idx") % stride === 0)
  }
}
