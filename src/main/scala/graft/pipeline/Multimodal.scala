package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media payloads ride as opaque `binary` columns next to a typed metadata
  * struct; all Spark-side plumbing (schema, partition sizing, batch shape)
  * is real. Codec status: images are decoded FOR REAL — 24-bit uncompressed
  * BMP via a pure-JVM pixel parser, and PNG/JPEG/GIF/WBMP via the JDK's own
  * `javax.imageio` (java.desktop ships with the runtime; no external
  * library) — as is PCM16 WAV audio (RIFF chunk walk + per-window RMS).
  * MP3 metadata (duration/bitrate/sample rate) is REAL too, via an MPEG
  * frame-header walk ([[mp3Meta]] — headers are plain bit fields; no codec
  * needed). Only PCM decode of codec-less formats (MP3 samples, H.264
  * video) falls back to the deterministic byte-derived fakes marked `STUB:`
  * below — same schema and batch shape, so a real codec drops in by
  * extending one dispatch.
  */
object Multimodal {

  /** media metadata struct carried beside every payload */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** Attach a metadata struct derived from raw fields. */
  def withMeta(df: DataFrame, format: Column, width: Column, height: Column,
               durationMs: Column): DataFrame =
    df.withColumn("meta", struct(
      format.as("format"), width.cast("int").as("width"),
      height.cast("int").as("height"), durationMs.cast("long").as("duration_ms")))

  /** Partition media rows so each task holds ~`targetMb` of payload — large
    * blobs otherwise skew task runtimes and blow executor memory. This is the
    * knob that matters at 100 TB: size tasks by bytes, not row count.
    */
  def repartitionBySize(df: DataFrame, payload: Column, targetMb: Int): DataFrame = {
    val targetBytes = targetMb.toLong * 1024 * 1024
    val totalBytes = df.agg(sum(length(payload))).collect()(0).getLong(0)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    df.repartition(parts)
  }

  // ---- real pure-JVM decoders for uncompressed formats -------------------

  /** REAL 24-bit uncompressed BMP decode: parse the header, walk the padded
    * bottom-up (or top-down) pixel rows, and average-pool grayscale
    * ((r+g+b)/3/255) into `dim` equal-width vertical strips. Returns null
    * for anything that isn't plain 24bpp BMP (dispatches to the stub).
    */
  private[graft] def bmpGrayStrips(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null || bytes.length < 54 ||
        bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val heightRaw = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (bpp != 24 || compression != 0 || width <= 0 || heightRaw == 0 ||
        dataOffset < 54) return null
    val height = math.abs(heightRaw)
    val rowBytes = ((width * 3 + 3) / 4) * 4
    if (dataOffset.toLong + rowBytes.toLong * height > bytes.length) return null
    val acc = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    var y = 0
    while (y < height) {
      // positive height = bottom-up storage (the common case)
      val srcRow = if (heightRaw > 0) height - 1 - y else y
      val base = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        val cell = math.min(dim - 1, x.toLong * dim / width).toInt
        acc(cell) += (r + g + b) / (3.0 * 255.0)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(i => if (cnt(i) == 0) 0f else (acc(i) / cnt(i)).toFloat)
  }

  /** REAL PCM16 WAV decode: walk the RIFF chunks to `fmt `/`data`, then RMS
    * of the normalized samples over `windows` equal segments. Returns null
    * for anything that isn't PCM16 WAV (dispatches to the stub).
    */
  private[graft] def wavRmsEnvelope(bytes: Array[Byte], windows: Int): Array[Float] = {
    if (bytes == null || bytes.length < 44) return null
    def tag(off: Int, s: String): Boolean =
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var pcm16 = false
    var dataPos = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val size = bb.getInt(pos + 4)
      if (tag(pos, "fmt ") && pos + 24 <= bytes.length)
        pcm16 = bb.getShort(pos + 8) == 1 && bb.getShort(pos + 22) == 16
      else if (tag(pos, "data")) { dataPos = pos + 8; dataLen = size }
      pos += 8 + math.max(0, size) + (size & 1) // chunks are word-aligned
    }
    if (!pcm16 || dataPos < 0) return null
    val n = math.min(dataLen, bytes.length - dataPos) / 2
    val out = new Array[Float](windows)
    var w = 0
    while (w < windows) {
      val s0 = (w.toLong * n / windows).toInt
      val s1 = ((w + 1).toLong * n / windows).toInt
      var sum = 0.0
      var i = s0
      while (i < s1) {
        val s = bb.getShort(dataPos + i * 2) / 32768.0
        sum += s * s
        i += 1
      }
      out(w) = if (s1 > s0) math.sqrt(sum / (s1 - s0)).toFloat else 0f
      w += 1
    }
    out
  }

  /** Magic-byte sniff for the formats [[imageioGrayStrips]] can actually
    * decode (PNG/JPEG/GIF; WBMP's 0x00 0x00 header included). Probing
    * `ImageIO.read` walks the whole reader registry per call — paying that
    * for every non-image payload in a 100 TB corpus is the difference
    * between a map-only decode pass and a registry-thrash pass.
    */
  private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
          b(3) == 'G'.toByte) ||                          // PNG
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||   // JPEG
        (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
          b(3) == '8'.toByte) ||                          // GIF87a/89a
        (b(0) == 0 && b(1) == 0))                         // WBMP

  /** REAL compressed-image decode via the JDK's `javax.imageio`
    * (PNG/JPEG/GIF/WBMP readers ship in java.desktop): bulk-read the ARGB
    * raster and average-pool grayscale into `dim` vertical strips — the same
    * pooling as [[bmpGrayStrips]]. Returns null when no JDK reader claims
    * the bytes (dispatches onward to the stub).
    */
  private[graft] def imageioGrayStrips(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null || bytes.length < 8 || !looksLikeImage(bytes)) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return null
      val acc = new Array[Double](dim)
      val cnt = new Array[Long](dim)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val cell = math.min(dim - 1, x.toLong * dim / w).toInt
          acc(cell) += (r + g + b) / (3.0 * 255.0)
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(i => if (cnt(i) == 0) 0f else (acc(i) / cnt(i)).toFloat)
    } catch { case _: Exception => null }
  }

  /** image decode → `dim` pooled grayscale features: REAL for 24-bit
    * uncompressed BMP via [[bmpGrayStrips]] (no ImageIO overhead) and for
    * every JDK-readable compressed format via [[imageioGrayStrips]]
    * (PNG/JPEG/GIF/WBMP); only unreadable payloads fall back to the STUB
    * (deterministic hashes of payload chunks — the `array<float>` of length
    * `dim` schema and batch shape are the same either way).
    */
  def decodeImageFeatures(payload: Column, dim: Int): Column = {
    val real = udf { (b: Array[Byte]) =>
      val bmp = bmpGrayStrips(b, dim)
      if (bmp != null) bmp else imageioGrayStrips(b, dim)
    }
    coalesce(real(payload),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        ((pmod(xxhash64(payload, i), lit(2000001L)) - 1000000L) /
          1000000.0).cast("float")))
  }

  /** REAL decode of every JDK-supported audio container/encoding
    * (8/16/24/32-bit, µ-law, a-law WAV; AU; AIFF) via `javax.sound.sampled`:
    * convert to signed PCM16 little-endian and RMS-window the samples — the
    * same envelope as [[wavRmsEnvelope]]. Returns null when no JDK provider
    * claims the bytes (dispatches onward to the stub).
    */
  /** Container sniff for the JDK audio providers (RIFF/WAVE, AU, AIFF) —
    * `AudioSystem.getAudioInputStream` signals "not audio" by THROWING, and
    * an exception per non-audio payload is the hot-path killer the image
    * sniff above avoids for ImageIO.
    */
  private[graft] def looksLikeAudio(b: Array[Byte]): Boolean = {
    def tag(off: Int, s: String): Boolean =
      s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    b.length >= 16 &&
      ((tag(0, "RIFF") && tag(8, "WAVE")) ||
        tag(0, ".snd") ||                          // AU
        (tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC"))))
  }

  private[graft] def audioSystemRms(bytes: Array[Byte], windows: Int): Array[Float] = {
    if (bytes == null || bytes.length < 16 || !looksLikeAudio(bytes)) return null
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = src.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels,
        base.getChannels * 2, base.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
      val data = pcm.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = data.length / 2
      if (n == 0) return null
      val out = new Array[Float](windows)
      var w = 0
      while (w < windows) {
        val s0 = (w.toLong * n / windows).toInt
        val s1 = ((w + 1).toLong * n / windows).toInt
        var sum = 0.0
        var i = s0
        while (i < s1) { val s = bb.getShort(i * 2) / 32768.0; sum += s * s; i += 1 }
        out(w) = if (s1 > s0) math.sqrt(sum / (s1 - s0)).toFloat else 0f
        w += 1
      }
      out
    } catch { case _: Exception => null }
  }

  /** audio decode → per-window energy envelope of `windows` values: REAL
    * for PCM16 WAV via [[wavRmsEnvelope]] (no provider overhead) and for
    * every JDK-decodable format via [[audioSystemRms]]; only payloads no
    * JDK provider claims (e.g. MP3) fall back to the STUB byte-slice hashes
    * (same schema).
    */
  def decodeAudioEnvelope(payload: Column, windows: Int): Column = {
    val real = udf { (b: Array[Byte]) =>
      val wav = wavRmsEnvelope(b, windows)
      if (wav != null) wav else audioSystemRms(b, windows)
    }
    coalesce(real(payload),
      transform(sequence(lit(0), lit(windows - 1)), i =>
        (pmod(xxhash64(substring(payload, lit(1).cast("int"), lit(64).cast("int")), i),
          lit(1000L)) / 1000.0).cast("float")))
  }

  /** REAL MP3 metadata via an MPEG frame-header walk (ISO 11172-3 §2.4.1.3):
    * no codec needed — duration, bitrate, and sample rate live in plain bit
    * fields of each 4-byte frame header, so skip any ID3v2 tag, sync to the
    * first Layer III header, and step frame to frame summing per-frame
    * durations (handles VBR, where no single header is authoritative).
    * Returns null unless ≥2 consecutive valid frames parse (a lone 0xFFEx
    * in random bytes is not an MP3). Result: [durationMs, avgBitrateKbps,
    * sampleRateHz, frameCount].
    */
  private[graft] def mp3Meta(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 4) return null
    var pos = 0
    // ID3v2 prefix: "ID3" + version(2) + flags(1) + syncsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I'.toByte && bytes(1) == 'D'.toByte &&
        bytes(2) == '3'.toByte) {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + sz
    }
    // sync scan for the first frame only (leading junk is common); after
    // that, frames must chain exactly or we stop (trailing ID3v1/garbage)
    val rates1 = Array(44100, 48000, 32000)
    val kbps1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val kbps2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    var frames = 0L
    var durationUs = 0.0
    var payloadBytes = 0L
    var rateOut = 0L
    var synced = false
    var done = false
    var scan = pos
    while (!done && scan + 4 <= bytes.length) {
      val b1 = bytes(scan) & 0xff; val b2 = bytes(scan + 1) & 0xff
      val b3 = bytes(scan + 2) & 0xff
      val version = (b2 >> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layer = (b2 >> 1) & 3     // 1=Layer III
      val brIdx = (b3 >> 4) & 15
      val srIdx = (b3 >> 2) & 3
      val pad = (b3 >> 1) & 1
      val valid = b1 == 0xff && (b2 & 0xe0) == 0xe0 && version != 1 &&
        layer == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3
      if (valid) {
        val mpeg1 = version == 3
        val rate = rates1(srIdx) / (version match {
          case 3 => 1; case 2 => 2; case _ => 4
        })
        val kbps = (if (mpeg1) kbps1 else kbps2)(brIdx)
        val samplesPerFrame = if (mpeg1) 1152 else 576
        val frameLen = samplesPerFrame / 8 * (kbps * 1000) / rate + pad
        if (frameLen < 4) return null
        if (scan + frameLen <= bytes.length) {
          frames += 1
          durationUs += samplesPerFrame * 1e6 / rate
          payloadBytes += frameLen
          rateOut = rate
          synced = true
          scan += frameLen
        } else if (synced) done = true // final frame truncated: valid header
                                       // but the body runs past the payload —
                                       // don't let it inflate duration/bitrate
        else scan += 1                 // spurious sync too close to the end
      } else if (synced) done = true   // chained walk hit trailing non-frame
      else scan += 1                   // still hunting for the first sync
    }
    if (frames < 2) return null
    val durationMs = math.round(durationUs / 1000.0)
    val avgKbps = math.round(payloadBytes * 8 / (durationUs / 1000.0))
    Array(durationMs, avgKbps, rateOut, frames)
  }

  /** MP3 metadata probe column: `struct<duration_ms, bitrate_kbps,
    * sample_rate, frames>` (null for non-MP3 payloads). Pairs with
    * [[withMeta]]: `withMeta(df, lit("mp3"), lit(0), lit(0),
    * mp3MetaProbe(col("payload")).getField("duration_ms"))` fills the meta
    * duration from the payload itself. PCM decode for MP3 stays out of
    * scope (the JDK ships no MP3 codec) — [[decodeAudioEnvelope]]'s STUB
    * branch still covers the envelope schema for those payloads.
    */
  def mp3MetaProbe(payload: Column): Column = {
    val p = udf { (b: Array[Byte]) =>
      val m = mp3Meta(b)
      if (m == null) null else (m(0), m(1), m(2), m(3))
    }
    p(payload).cast(
      "struct<duration_ms:bigint,bitrate_kbps:bigint,sample_rate:bigint,frames:bigint>")
  }

  /** STUB: sample every-nth frame of a video payload as binary slices.
    * Real path: container demux + keyframe extraction. The fake slices bytes
    * (substring on binary is a real Spark op) so downstream plumbing sees
    * genuine per-frame binary chunks.
    */
  def sampleFrames(payload: Column, frameBytes: Int, everyN: Int,
                   maxFrames: Int): Column =
    filter(
      transform(sequence(lit(0), lit(maxFrames - 1)),
        i => payload.substr(i * frameBytes * everyN + 1, lit(frameBytes))),
      f => length(f) > 0)

  /** Resize metadata after a (stubbed) scale operation — the metadata math
    * is real; the pixel work is the codec's job.
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    struct(
      meta.getField("format").as("format"),
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }
}
