package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque `binary` payloads with typed
 * metadata, a batched per-partition decode/feature-extract stage, and
 * a deterministic STAND-IN decoder (this container has no image/audio
 * codecs — the decode body below is a clearly-marked fake; the Spark
 * surface around it — schema, partitioning, batch shape — is real and
 * tested, and a production codec drops into [[decodeBytes]]).
 */
object Multimodal {

  /** Typed metadata for an opaque payload. */
  final case class MediaMeta(format: String, n_bytes: Long)

  /** Extracted features of one payload. */
  final case class MediaFeatures(
      n_bytes: Long, byte_mean: Double, byte_entropy: Double, checksum: Long)

  /** STUB DECODER — deterministic fake: byte-level statistics instead
    * of a real codec. Replace this body with the actual image/audio
    * decode + featurize; everything around it stays unchanged. */
  def decodeBytes(payload: Array[Byte]): MediaFeatures = {
    if (payload == null || payload.isEmpty) return MediaFeatures(0L, 0.0, 0.0, 0L)
    val hist = new Array[Long](256)
    var sum = 0.0
    var checksum = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b) += 1
      sum += b
      checksum = (checksum ^ b) * 0x100000001b3L
      i += 1
    }
    var entropy = 0.0
    val n = payload.length.toDouble
    var k = 0
    while (k < 256) {
      if (hist(k) > 0) { val p = hist(k) / n; entropy -= p * math.log(p) / math.log(2.0) }
      k += 1
    }
    MediaFeatures(payload.length.toLong, sum / n, entropy, checksum)
  }

  /** Attach an opaque payload + typed metadata to a text corpus —
    * the synthetic stand-in for an (image_path, image_bytes) ingest:
    * payload bytes are the UTF-8 of the text (deterministic). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("text/utf-8").as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Batched decode stage: runs per partition over the binary column.
    * The UDF receives one payload per row; Spark pipelines whole
    * partitions through it — the batch shape a Pandas-UDF equivalent
    * would see. Column-pruned: only `payload` feeds the decode. */
  def decodeStage(df: DataFrame): DataFrame = {
    val decodeU = udf((payload: Array[Byte]) => decodeBytes(payload))
    df.withColumn("features", decodeU(col("payload")))
  }

  // ---------------- REAL binary metadata sniffing ----------------

  /** Container-level metadata parsed from raw bytes — what a
    * training-data pipeline extracts BEFORE deciding to decode:
    * format from magic bytes, image dimensions from the PNG IHDR /
    * JPEG SOFn headers, audio shape from the WAV fmt chunk. Pure JVM
    * byte parsing, no codec library — this part of the multimodal
    * story is NOT a stub. */
  final case class SniffedMeta(
      format: String, n_bytes: Long,
      width: Int, height: Int, // -1 when not an image
      sample_rate: Int, channels: Int) // -1 when not audio

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Sniff format + shape from the payload's container headers.
    *  - PNG: 8-byte signature, IHDR width/height at offsets 16/20
    *    (big-endian, PNG spec §5.2, §11.2.2)
    *  - JPEG: FF D8 SOI, walk marker segments to the first SOFn
    *    (C0-CF except C4/C8/CC) -> height/width (JPEG ISO 10918 B.2.2)
    *  - WAV: RIFF....WAVE, walk chunks to `fmt ` -> channels,
    *    sample rate (RIFF spec)
    * Unknown/truncated payloads sniff as application/octet-stream —
    * malformed data must never fail the pipeline. */
  def sniffBytes(b: Array[Byte]): SniffedMeta = {
    val n = if (b == null) 0L else b.length.toLong
    def unknown = SniffedMeta("application/octet-stream", n, -1, -1, -1, -1)
    if (b == null || b.length < 12) return unknown
    try {
      if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
        if (b.length < 24) unknown
        else SniffedMeta("image/png", n, be32(b, 16), be32(b, 20), -1, -1)
      } else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // walk JPEG marker segments
        var o = 2
        while (o + 9 < b.length) {
          if ((b(o) & 0xff) != 0xff) return unknown
          val marker = b(o + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            return SniffedMeta("image/jpeg", n, be16(b, o + 7), be16(b, o + 5), -1, -1)
          }
          o += 2 + be16(b, o + 2) // segment length includes its own 2 bytes
        }
        unknown
      } else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
        var o = 12
        while (o + 8 <= b.length) {
          val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
          val size = le32(b, o + 4)
          if (isFmt && o + 16 <= b.length)
            return SniffedMeta("audio/wav", n, -1, -1, le32(b, o + 12), le16(b, o + 10))
          o += 8 + size + (size & 1) // chunks are word-aligned
        }
        unknown
      } else unknown
    } catch { case _: ArrayIndexOutOfBoundsException => unknown }
  }

  /** Sniff stage over a binary column (same batched per-partition
    * shape as [[decodeStage]]). */
  def sniffStage(df: DataFrame, payloadCol: String): DataFrame = {
    val sniffU = udf((payload: Array[Byte]) => sniffBytes(payload))
    df.withColumn("sniffed", sniffU(col(payloadCol)))
  }

  // ------------- deterministic synthetic payload builders -------------
  // (the container has no media files; these construct VALID minimal
  // containers so the sniffing path is exercised on real byte layouts)

  /** Minimal valid PNG: signature + IHDR with the given dimensions. */
  def syntheticPng(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 25)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by the sniffer
    out.array()
  }

  /** Minimal JPEG: SOI, one APP0 segment, SOF0 with dimensions. */
  def syntheticJpeg(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 4 + 16 + 2 + 2 + 7 + 9)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(18.toShort) // APP0 len 18
    out.put(new Array[Byte](16))
    out.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort) // SOF0 len 17
    out.put(8.toByte).putShort(height.toShort).putShort(width.toShort)
    out.put(new Array[Byte](out.remaining()))
    out.array()
  }

  /** Minimal WAV: RIFF/WAVE + fmt chunk with rate and channels. */
  def syntheticWav(sampleRate: Int, channels: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(28).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    out.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16.toShort)
    out.array()
  }
}
