package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * Three decode tiers, all REAL pure-JVM codecs: [[decodeImageMeta]]
  * (PNG/JPEG/GIF header parse → pixel dimensions), [[decodeAudioMeta]]
  * (WAV/RIFF chunk walk → PCM geometry), and [[decodePixels]] (full
  * image decode → band-interleaved pixel tensor via `javax.imageio`,
  * which reads PNG/GIF/JPEG/BMP without native libraries) — each spec'd
  * against genuine `ImageIO`/`AudioSystem`-encoded files. Only codecs
  * the JVM lacks (video containers, compressed audio) remain behind the
  * deterministic fake ([[fakeDecodeFeatures]]); the asset schema,
  * binary column handling, batched `mapPartitions` execution shape,
  * frame sampling, and feature schema are the same real plumbing a
  * production libavcodec call would slot into.
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
  def decodeFeatures(assets: DataFrame): DataFrame =
    mapAssets(assets, featureSchema)((id, bytes) =>
      Row.fromSeq(Seq(id) ++ fakeDecodeFeatures(bytes)))

  /** The shared per-partition decode plumbing every tier runs through —
    * ONE place for the batch mechanism, the null-payload guard, and the
    * schema application, so a change to the execution shape (or a
    * production codec's JNI batching) lands once, not once per
    * decoder. */
  private def mapAssets(assets: DataFrame, schema: StructType)
                       (decodeRow: (Long, Array[Byte]) => Row): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        decodeRow(r.getLong(0), bytes)
      }
    }
    spark.createDataFrame(rdd, schema)
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

  /** Output schema of [[decodeImageMeta]]: parse failures carry null
    * format/dims (kept, not dropped — a corrupt payload is a data-quality
    * signal the pipeline filters on downstream). */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** REAL image-header decode (no stub): pixel dimensions from PNG,
    * JPEG, and GIF payload bytes, pure JVM, batched per partition exactly like
    * [[decodeFeatures]] — the production shape where this parser is a
    * libjpeg/ffmpeg call. Header-only: no pixel decode, so cost is O(1)
    * per asset regardless of payload size (at 100 TB of media that is
    * the difference between a metadata scan and a decode job). */
  def decodeImageMeta(assets: DataFrame): DataFrame =
    mapAssets(assets, imageMetaSchema)((id, bytes) =>
      imageDims(bytes) match {
        case Some((fmt, w, h)) => Row(id, fmt, w, h)
        case None => Row(id, null, null, null)
      })

  /** Parse (format, width, height) from image header bytes.
    *
    * PNG: 8-byte signature, then the IHDR chunk (always first, per the
    * spec) carries width/height as big-endian int32 at offsets 16/20.
    * JPEG: walk the marker stream from SOI (FFD8) skipping
    * variable-length segments until a start-of-frame marker (SOFn,
    * n ∉ {4,8,12} — those are DHT/JPG/DAC, not frames); height/width
    * are big-endian uint16 at offsets +5/+7 into the SOF segment.
    * GIF: "GIF87a"/"GIF89a" magic, then the logical-screen descriptor
    * carries width/height as LITTLE-endian uint16 at offsets 6/8.
    * Anything unparseable (truncated, wrong magic, zero dims, marker
    * desync) → None, never a throw: one corrupt payload must not kill a
    * 100 TB scan task. */
  private[graft] def imageDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= bytes.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a"))) {
      val w = le16(6); val h = le16(8)
      if (w > 0 && h > 0) Some(("gif", w, h)) else None
    } else if (bytes.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      // bytes 12..15 must name the IHDR chunk
      if (u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
        val w = be32(16); val h = be32(20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("png", w.toInt, h.toInt))
        else None
      } else None
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 1 < bytes.length) {
        if (u8(i) != 0xff) return None // marker desync
        var m = u8(i + 1)
        // fill bytes: any number of FFs may pad before a marker
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) }
        m match {
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            if (i + 8 >= bytes.length) return None
            val h = be16(i + 5); val w = be16(i + 7)
            return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
          case 0xd8 | 0x01 => i += 2 // standalone markers, no length
          case x if x >= 0xd0 && x <= 0xd7 => i += 2 // RSTn
          case 0xd9 => return None // EOI before any frame header
          case _ =>
            if (i + 3 >= bytes.length) return None
            val segLen = be16(i + 2)
            if (segLen < 2) return None
            // Long cursor math: near-2GB payloads must exit the walk,
            // not wrap the Int cursor negative and throw on the index
            val next = i.toLong + 2 + segLen
            if (next > bytes.length) return None
            i = next.toInt
        }
      }
      None
    } else None
  }

  /** Output schema of [[decodeAudioMeta]] — same null-on-parse-failure
    * convention as [[imageMetaSchema]]. `n_frames` = PCM sample frames
    * in the declared data chunk (data bytes / block align), the basis
    * for duration (`n_frames / sample_rate`) without touching samples. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  /** REAL audio-header decode: PCM metadata from WAV (RIFF) payload
    * bytes, batched per partition like [[decodeImageMeta]]. Header-only
    * (fmt + declared data size), so O(1) per asset — a 100 TB audio
    * corpus scans as metadata, not as samples. */
  def decodeAudioMeta(assets: DataFrame): DataFrame =
    mapAssets(assets, audioMetaSchema)((id, bytes) =>
      wavMeta(bytes) match {
        case Some((ch, rate, bits, frames)) => Row(id, ch, rate, bits, frames)
        case None => Row(id, null, null, null, null)
      })

  /** Parse (channels, sampleRate, bitsPerSample, frameCount) from a WAV
    * header: "RIFF"/"WAVE" magic, then a chunk walk ("fmt " for the PCM
    * geometry, "data" for the declared payload size — chunks are padded
    * to even offsets, and unknown chunks like LIST/fact are skipped by
    * their declared length). The data chunk's size is trusted as
    * declared even if the buffer is truncated after the header: this is
    * a header parser, and the frame count is metadata, not a read.
    * Unparseable/zero-geometry input → None, never a throw. */
  private[graft] def wavMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= bytes.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (!(bytes.length >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE"))) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val size = le32(i + 4)
      if (ascii(i, "fmt ") && size >= 16 && i + 8 + 16 <= bytes.length) {
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22), le16(i + 20)))
      } else if (ascii(i, "data")) {
        dataBytes = size
      }
      // Long cursor math (chunks are word-aligned: odd sizes carry a pad
      // byte): a corrupt 4-byte size must end the walk, not wrap the Int
      // cursor negative and throw on the index. Past-the-end is fine for
      // the FINAL chunk (header-only truncation) — the loop just exits.
      val next = i.toLong + 8 + size + (size & 1)
      i = if (next > bytes.length) bytes.length else next.toInt // ends the walk
    }
    fmt match {
      case Some((ch, rate, bits, block)) if ch > 0 && rate > 0 && bits > 0 &&
          block > 0 && dataBytes >= 0 =>
        Some((ch, rate, bits, dataBytes / block))
      case _ => None
    }
  }

  /** Output schema of [[decodePixels]]: the tensor tier. `pixels` is the
    * decoded raster, band-interleaved row-major — sample index
    * `(y * width + x) * n_channels + band` — the layout ML feature
    * pipelines consume directly. Parse failures carry null dims and a
    * null tensor (kept, not dropped — the [[imageMetaSchema]]
    * convention). */
  val pixelSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_channels", IntegerType, nullable = true),
    StructField("pixels", ArrayType(IntegerType), nullable = true)))

  /** Pixel cap for [[decodePixels]]: a decoded tensor larger than this
    * (samples = w·h·bands) is reported as a parse failure instead of
    * materializing a row that dwarfs every other row in its partition —
    * the task-OOM guard a 100 TB media scan needs against one
    * pathological 30k×30k input. 64M samples ≈ 256 MB of ints. */
  val MaxPixelSamples: Long = 64L * 1024 * 1024

  /** REAL full image decode (no stub): payload bytes → pixel tensor via
    * `javax.imageio.ImageIO`, pure JVM — PNG, GIF, BMP and baseline
    * JPEG decode without any native library. Batched per partition like
    * the metadata tiers; per-row cost is the actual pixel decode, so
    * unlike [[decodeImageMeta]] this IS a decode job, not a metadata
    * scan — at scale, repartition first so large images spread across
    * tasks, and project the tensor away as soon as features are
    * derived. Raster samples are read band-by-band (`Raster.getPixels`),
    * NOT through `getRGB`'s sRGB conversion — lossless formats round
    * their encoded samples through bit-exactly, which is what makes an
    * arithmetic oracle over the tensor possible. */
  def decodePixels(assets: DataFrame): DataFrame =
    mapAssets(assets, pixelSchema)((id, bytes) =>
      decodeRaster(bytes) match {
        case Some((w, h, c, px)) => Row(id, w, h, c, px.toSeq)
        case None => Row(id, null, null, null, null)
      })

  /** `ImageIO.read(InputStream)` / `write(OutputStream)` default to a
    * DISK-cached image stream — one temp-file create/delete per image,
    * which at 500k assets per task is filesystem churn dwarfing the
    * decode itself (measured: the 100× q_pixel_stats sweep). The
    * payloads here are in-memory byte arrays; force the memory cache
    * once per JVM. (Thread-safe: a plain static flag read at stream
    * creation.) */
  private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Decode (width, height, bands, band-interleaved samples) from image
    * bytes. Corrupt/unknown/oversized input → None, never a throw: one
    * bad payload must not kill a whole scan task (the [[imageDims]]
    * contract). */
  private[graft] def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    try {
      imageIoMemoryCache
      // The MaxPixelSamples cap must run BEFORE any pixel decode: a
      // 30k×30k decompression-bomb PNG materializes a multi-GB raster
      // inside ImageIO.read, and the resulting OutOfMemoryError is
      // fatal — not NonFatal — so a post-decode check would never even
      // catch it. Read dimensions (and the planned band count) from the
      // HEADER via the reader, gate, and only then decode.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // the stream is closed on EVERY path (no-reader return included):
      // per-row MemoryCacheImageInputStream buffers otherwise wait for
      // GC, avoidable pressure in the hottest loop of a 500k-asset task
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None // no registered reader recognized the bytes
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            // band count bound for the gate: the MAX across every image
            // type the reader may legally decode to (header metadata, no
            // pixel decode). The first type alone under-bounds: a palette
            // image can declare a 1-band indexed type yet decode to a
            // 3-4-band raster, which would let reader.read materialize
            // ~4× MaxPixelSamples before the post-decode recheck — and
            // an OutOfMemoryError inside read() is fatal, not caught. A
            // reader that names no types gets the conservative 4.
            val c = {
              val types = reader.getImageTypes(0)
              var maxBands = 0
              while (types.hasNext)
                maxBands = math.max(maxBands, types.next().getNumBands)
              if (maxBands > 0) maxBands else 4
            }
            if (w <= 0 || h <= 0 || c <= 0 || w.toLong * h * c > MaxPixelSamples) None
            else {
              val img = reader.read(0)
              val raster = img.getRaster
              val rc = raster.getNumBands // trust the decoded raster over the header
              if (w.toLong * h * rc > MaxPixelSamples) None
              else {
                val px = new Array[Int](w * h * rc)
                raster.getPixels(0, 0, w, h, px)
                Some((w, h, rc, px))
              }
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic BILINEAR RESIZE to a fixed (targetW × targetH) —
    * the feature-prep step between decode and model input, emitting
    * the resized sample TENSOR (the training-pipeline form), not
    * re-encoded bytes. Deliberately NOT Graphics2D: Java2D's scaler is
    * an implementation detail free to vary across JVMs, while this is
    * plain IEEE double arithmetic (half-pixel-centered source
    * coordinates, edge-clamped 2×2 gather, two lerps,
    * `floor(v + 0.5)`), so the same input yields the same tensor on
    * every platform — which is what lets `q_image_resize` recompute a
    * resize of GENUINE PNG bytes arithmetically in DuckDB, and what a
    * training pipeline needs anyway (a dataset rebuilt on new hardware
    * must hash identically). Corrupt/oversized input → null row, the
    * [[decodePixels]] contract; per-row cost is O(target samples), no
    * shuffle. */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1, s"bad target: ${targetW}x$targetH")
    mapAssets(assets, pixelSchema)((id, bytes) =>
      decodeRaster(bytes) match {
        case Some((w, h, c, px)) =>
          Row(id, targetW, targetH, c,
            resizeRaster(w, h, c, px, targetW, targetH).toSeq)
        case None => Row(id, null, null, null, null)
      })
  }

  /** The kernel: `px` pixel-interleaved (`(y·w + x)·c + b`, the
    * [[decodeRaster]] layout), output the same layout at the target
    * size. */
  private[graft] def resizeRaster(w: Int, h: Int, c: Int, px: Array[Int],
                                  tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th * c)
    var ty = 0
    while (ty < th) {
      val sy = (ty + 0.5) * h / th - 0.5
      val y0 = math.min(h - 1, math.max(0, math.floor(sy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val fy = math.min(1.0, math.max(0.0, sy - y0))
      var tx = 0
      while (tx < tw) {
        val sx = (tx + 0.5) * w / tw - 0.5
        val x0 = math.min(w - 1, math.max(0, math.floor(sx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val fx = math.min(1.0, math.max(0.0, sx - x0))
        var b = 0
        while (b < c) {
          val v00 = px((y0 * w + x0) * c + b).toDouble
          val v10 = px((y0 * w + x1) * c + b).toDouble
          val v01 = px((y1 * w + x0) * c + b).toDouble
          val v11 = px((y1 * w + x1) * c + b).toDouble
          val top = v00 + (v10 - v00) * fx
          val bot = v01 + (v11 - v01) * fx
          out((ty * tw + tx) * c + b) =
            math.floor(top + (bot - top) * fy + 0.5).toInt
          b += 1
        }
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Output schema of [[decodeAudioSamples]]: the audio SAMPLE tier —
    * the [[pixelSchema]] convention over PCM. `samples` is the decoded
    * waveform, frame-interleaved — sample index `frame · channels +
    * channel` — 16-bit PCM as signed values in [-32768, 32767], 8-bit
    * PCM as its native unsigned [0, 255]. Parse failures carry null
    * geometry and a null waveform (kept, not dropped). */
  val audioSamplesSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("samples", ArrayType(IntegerType), nullable = true)))

  /** Deterministic LINEAR RESAMPLE of decoded waveforms to a fixed
    * `targetRate` — [[resizeImages]]'s 1-D sibling, the normalization
    * step a mixed-rate audio corpus needs before featurization. Same
    * doctrine: plain IEEE arithmetic (source position `f·src/target`,
    * edge-clamped 2-tap gather per channel, one lerp, `floor(v+0.5)` —
    * sound for negative PCM too, unlike a half-away round), never an
    * `AudioSystem` conversion whose interpolator is an implementation
    * detail; the output frame count is the integer floor
    * `n·target / src` (exact long arithmetic, mirrored by the oracle).
    * A payload the decoder rejects, and a decoded waveform with zero
    * complete frames, yield a null row (the [[decodePixels]]
    * contract). Output matches [[decodeAudioSamples]]'s schema with
    * `sample_rate = targetRate`, samples frame-interleaved. */
  def resampleAudio(assets: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate >= 1, s"bad target rate: $targetRate")
    mapAssets(assets, audioSamplesSchema)((id, bytes) =>
      wavSamples(bytes) match {
        case Some((ch, rate, bits, px)) if px.length >= ch && ch > 0 =>
          Row(id, ch, targetRate, bits,
            resamplePcm(ch, rate, px, targetRate).toSeq)
        case _ => Row(id, null, null, null, null)
      })
  }

  /** The kernel: `px` frame-interleaved (`frame·channels + channel`,
    * the [[decodeAudioSamples]] layout), output the same layout at
    * `floor(frames·target/src)` frames (≥ 1). */
  private[graft] def resamplePcm(channels: Int, srcRate: Int,
                                 px: Array[Int], targetRate: Int): Array[Int] = {
    val n = px.length / channels
    val m = math.max(1L, n.toLong * targetRate / srcRate).toInt
    val out = new Array[Int](m * channels)
    var f = 0
    while (f < m) {
      val sf = f.toDouble * srcRate / targetRate
      val f0 = math.min(n - 1, math.floor(sf).toInt)
      val f1 = math.min(n - 1, f0 + 1)
      val fx = math.min(1.0, math.max(0.0, sf - f0))
      var c = 0
      while (c < channels) {
        val v0 = px(f0 * channels + c).toDouble
        val v1 = px(f1 * channels + c).toDouble
        out(f * channels + c) = math.floor(v0 + (v1 - v0) * fx + 0.5).toInt
        c += 1
      }
      f += 1
    }
    out
  }

  /** Sample cap for [[decodeAudioSamples]] — the [[MaxPixelSamples]]
    * task-OOM guard applied to waveforms: a payload declaring more PCM
    * samples than this is reported as a parse failure instead of
    * materializing one row that dwarfs its partition. 64M samples ≈
    * 256 MB of ints ≈ 25 minutes of 16-bit stereo at 44.1 kHz. */
  val MaxAudioSamples: Long = 64L * 1024 * 1024

  /** REAL audio-sample decode (no stub): WAV PCM payload bytes → the
    * waveform, batched per partition like every tier. Where
    * [[decodeAudioMeta]] stops at the declared geometry (the metadata
    * scan), this reads the data chunk — 8-bit and 16-bit integer PCM,
    * the formats inside `audio/wav` that need no codec — so per-row
    * cost IS the payload scan: at 100 TB run it AFTER metadata-tier
    * filtering, repartitioned so large files spread across tasks (the
    * [[decodePixels]] guidance). Truncated payloads decode their
    * complete frames (a tail fragment of a frame is dropped, never a
    * partial frame); unsupported formats (compressed, float,
    * 24/32-bit) and oversized declarations are parse failures. */
  def decodeAudioSamples(assets: DataFrame): DataFrame =
    mapAssets(assets, audioSamplesSchema)((id, bytes) =>
      wavSamples(bytes) match {
        case Some((ch, rate, bits, px)) => Row(id, ch, rate, bits, px.toSeq)
        case None => Row(id, null, null, null, null)
      })

  /** Decode (channels, sampleRate, bitsPerSample, samples) from WAV
    * bytes: the [[wavMeta]] chunk walk, plus the data-chunk payload
    * decoded as integer PCM. Returns None — never a throw — for
    * non-PCM formats (only format code 1 with 8 or 16 bits is integer
    * PCM the JVM can decode without a codec), declared sample counts
    * over [[MaxAudioSamples]], or unparseable containers. */
  private[graft] def wavSamples(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Int])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= bytes.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (!(bytes.length >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE"))) return None
    var i = 12
    // channels, rate, bits, blockAlign, format code
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var dataOffset = -1
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataOffset < 0)) {
      val size = le32(i + 4)
      if (ascii(i, "fmt ") && size >= 16 && i + 8 + 16 <= bytes.length) {
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22),
          le16(i + 20), le16(i + 8)))
      } else if (ascii(i, "data")) {
        dataOffset = i + 8
        dataBytes = size
      }
      val next = i.toLong + 8 + size + (size & 1) // word-aligned chunks
      i = if (next > bytes.length) bytes.length else next.toInt
    }
    fmt match {
      case Some((ch, rate, bits, block, code))
          if code == 1 && (bits == 8 || bits == 16) && ch > 0 && rate > 0 &&
            block == ch * (bits / 8) && dataOffset >= 0 && dataBytes >= 0 &&
            (dataBytes / (bits / 8)) <= MaxAudioSamples =>
        // complete frames only, within both the declared size and the
        // buffer (a truncated tail fragment never yields a partial frame)
        val avail = math.min(dataBytes, (bytes.length - dataOffset).toLong)
        val nFrames = (avail / block).toInt
        val out = new Array[Int](nFrames * ch)
        var s = 0
        while (s < out.length) {
          if (bits == 8) out(s) = u8(dataOffset + s)
          else out(s) = le16(dataOffset + 2 * s).toShort.toInt // sign-extend
          s += 1
        }
        Some((ch, rate, bits, out))
      case _ => None
    }
  }

  /** Deterministic REAL-WAV asset generator — the
    * [[syntheticPngAssets]] idea for audio: for each id, 16-bit PCM
    * with `1 + id mod 2` channels at `8000 · (1 + id mod 5)` Hz,
    * `16 + id mod 49` frames, sample
    * `s(f, c) = ((7·id + 9973·f + 12345·c) mod 65536) − 32768`, encoded
    * through the actual `javax.sound.sampled.AudioSystem` WAVE writer
    * on the executors — genuine playable WAV files whose every sample
    * a SQL oracle can recompute arithmetically. Integer PCM is
    * lossless, so the encode→decode round trip is bit-exact. */
  def syntheticWavAssets(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rdd = src.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val ch = (1 + math.floorMod(id, 2)).toInt
        val rate = (8000 * (1 + math.floorMod(id, 5))).toInt
        val nFrames = (16 + math.floorMod(id, 49)).toInt
        val pcm = java.nio.ByteBuffer.allocate(nFrames * ch * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var f = 0
        while (f < nFrames) {
          var c = 0
          while (c < ch) {
            pcm.putShort(
              (math.floorMod(7 * id + 9973 * f + 12345 * c, 65536) - 32768).toShort)
            c += 1
          }
          f += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, ch, true, false) // signed, little-endian
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm.array()), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Deterministic REAL-PNG asset generator: for each id, an 8-bit
    * grayscale image of `(8 + id % 9) × (8 + 3·id % 9)` pixels with
    * sample `g(x, y) = (id + x + y) mod 256`, encoded through the
    * actual `ImageIO` PNG writer (zlib, CRCs and all) on the executors —
    * payloads are genuine decodable PNGs, not hand-assembled headers,
    * yet every pixel is reproducible arithmetically, so a SQL oracle
    * can recompute the tensor the decoder must produce. PNG is
    * lossless and grayscale rasters carry no color-management step, so
    * the encode→decode round trip is bit-exact. */
  def syntheticPngAssets(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rdd = src.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (8 + math.floorMod(id, 9)).toInt
        val h = (8 + math.floorMod(id * 3, 9)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, math.floorMod(id + x + y, 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        imageIoMemoryCache // write-side too: no temp file per encoded PNG
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Output schema of [[decodeGifFrames]]: one row per SAMPLED frame;
    * a corrupt/unreadable container yields one all-null row (the
    * [[decodePixels]] keep-don't-drop convention). */
  val videoFrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("pixels", ArrayType(IntegerType), nullable = true)))

  private def flatMapAssets(assets: DataFrame, schema: StructType)
                           (decodeRows: (Long, Array[Byte]) => Iterator[Row]): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        decodeRows(r.getLong(0), bytes)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL multi-frame container decode (no stub): every `stride`-th
    * frame of an animated GIF — the one multi-frame video-like format
    * the bare JVM decodes end-to-end — as a pixel-tensor row. This is
    * the video tier's true shape where [[sampleFrames]] is the
    * byte-window stand-in: the container declares its frame count, the
    * sampler touches ONLY the frames it keeps (ImageIO reads frames by
    * index; skipped frames are never decoded), and each kept frame
    * passes the same [[MaxPixelSamples]] bomb guard as the still-image
    * tier. At 100 TB this is the ffmpeg-keyframe-sample call; the
    * plumbing — explode to (asset, frame) rows, per-frame guards,
    * corrupt-container null rows — is exactly what that call drops
    * into. */
  def decodeGifFrames(assets: DataFrame, stride: Int = 1): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    flatMapAssets(assets, videoFrameSchema) { (id, bytes) =>
      gifFrames(bytes, stride) match {
        case Some((nf, frames)) =>
          frames.iterator.map { case (f, w, h, px) =>
            Row(id, f, nf, w, h, px.toSeq) }
        case None => Iterator.single(Row(id, null, null, null, null, null))
      }
    }
  }

  /** Decode (frameCount, every `stride`-th frame's (index, w, h,
    * samples)) from an animated-GIF container. None — never a throw —
    * for unreadable bytes; an individual frame beyond the sample cap
    * poisons the whole container to None (a bomb mid-sequence must not
    * read as a short clean clip). Frames are the RAW stored rasters
    * (full frames as [[syntheticGifAssets]] writes them — a
    * delta-composited GIF would need compositing this decoder does not
    * do). */
  private[graft] def gifFrames(bytes: Array[Byte], stride: Int)
      : Option[(Int, Seq[(Int, Int, Int, Array[Int])])] =
    try {
      imageIoMemoryCache
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false: getNumImages(true) walks the whole
            // sequence, then frames are read by index
            reader.setInput(iis, false, true)
            val nf = reader.getNumImages(true)
            if (nf <= 0) None
            else {
              val kept = Seq.newBuilder[(Int, Int, Int, Array[Int])]
              var f = 0
              var ok = true
              while (f < nf && ok) {
                if (f % stride == 0) {
                  val w = reader.getWidth(f); val h = reader.getHeight(f)
                  // conservative 4-band bound pre-decode (the
                  // decodeRaster rationale)
                  if (w <= 0 || h <= 0 || w.toLong * h * 4 > MaxPixelSamples) ok = false
                  else {
                    val raster = reader.read(f).getRaster
                    val rc = raster.getNumBands
                    if (w.toLong * h * rc > MaxPixelSamples) ok = false
                    else {
                      val px = new Array[Int](w * h * rc)
                      raster.getPixels(0, 0, w, h, px)
                      kept += ((f, w, h, px))
                    }
                  }
                }
                f += 1
              }
              if (ok) Some((nf, kept.result())) else None
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Animated-GIF fixture: per source row a GENUINE multi-frame GIF
    * through the JDK's own sequence writer — `2 + id mod 4` grayscale
    * frames of `(8 + id mod 5) × (8 + 3·id mod 5)`, frame `f` pixel
    * `g(x,y,f) = (id + x + y + 7f) mod 256`. Gray GIF round-trips
    * exactly (the 256-gray ramp palette; spec-pinned), so the decode
    * oracle recomputes every sampled pixel arithmetically. */
  def syntheticGifAssets(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rdd = src.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val nf = (2 + math.floorMod(id, 4)).toInt
        val w = (8 + math.floorMod(id, 5)).toInt
        val h = (8 + math.floorMod(id * 3, 5)).toInt
        imageIoMemoryCache
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  math.floorMod(id + x + y + 7L * f, 256).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally { ios.close(); writer.dispose() }
        Row(id, bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, schema)
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
