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
      } else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        // GIF87a/89a: logical screen dimensions, LE16 at offsets 6/8
        SniffedMeta("image/gif", n, le16(b, 6), le16(b, 8), -1, -1)
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

  // ------------- frame sampling (animated GIF container) -------------

  /** One indexed frame of a multi-frame container: where its image
    * descriptor starts and the preceding graphic-control delay
    * (centiseconds; -1 when the frame carried no GCE). */
  final case class FrameRef(frame_idx: Int, byte_offset: Int, delay_cs: Int)

  /** Frame index of an animated GIF — REAL container parsing (the one
    * multi-frame media format walkable in pure JVM): GIF87a/89a
    * signature, logical screen descriptor (skipping the global color
    * table when its flag is set), then the block stream — extension
    * blocks (0x21; the 0xF9 graphic-control extension yields the next
    * frame's delay) with their length-prefixed sub-blocks, image
    * descriptors (0x2C; each one is a frame — local color table and
    * LZW data sub-blocks skipped structurally), 0x3B trailer.
    * Malformed or truncated payloads return the frames indexed so far
    * (never throw — same contract as [[sniffBytes]]). What is NOT
    * done here is pixel decode: that is [[decodeBytes]]'s stub. */
  def gifFrameIndex(b: Array[Byte]): Seq[FrameRef] = {
    if (b == null || b.length < 14) return Seq.empty
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return Seq.empty
    val out = Seq.newBuilder[FrameRef]
    try {
      var o = 6
      val flags = b(o + 4) & 0xff
      o += 7
      if ((flags & 0x80) != 0) o += 3 * (1 << ((flags & 0x07) + 1))
      var delay = -1
      var idx = 0
      var done = false
      def skipSubBlocks(): Unit = {
        var len = b(o) & 0xff
        while (len != 0) { o += 1 + len; len = b(o) & 0xff }
        o += 1
      }
      while (!done && o < b.length) {
        (b(o) & 0xff) match {
          case 0x21 =>
            val label = b(o + 1) & 0xff
            o += 2
            if (label == 0xf9 && (b(o) & 0xff) >= 4) delay = le16(b, o + 2)
            skipSubBlocks()
          case 0x2c =>
            out += FrameRef(idx, o, delay)
            idx += 1; delay = -1
            val lflags = b(o + 9) & 0xff
            o += 10
            if ((lflags & 0x80) != 0) o += 3 * (1 << ((lflags & 0x07) + 1))
            o += 1 // LZW minimum code size
            skipSubBlocks()
          case _ => done = true // 0x3B trailer, or malformed: stop
        }
      }
    } catch { case _: ArrayIndexOutOfBoundsException => () }
    out.result()
  }

  /** Frame-sample stage: one output row per every-k-th frame of each
    * payload, as a `frame` struct column — the distributed video
    * plumbing (per-row container walk, explode to frame rows; a real
    * pixel pipeline feeds the sampled (payload, byte_offset) pairs to
    * its codec). The k-th-frame filter runs INSIDE the indexing UDF,
    * so non-sampled frames never materialize as rows; payloads with
    * no frames (non-GIF, malformed) drop out, mirroring explode
    * semantics — sniff first if every row must survive. */
  def frameSampleStage(df: DataFrame, payloadCol: String,
      everyK: Int = 1): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val idxU = udf((p: Array[Byte]) =>
      gifFrameIndex(p).filter(_.frame_idx % everyK == 0))
    df.withColumn("frame", explode(idxU(col(payloadCol))))
  }

  /** Minimal valid animated GIF89a: logical screen descriptor (no
    * global color table), then per frame a graphic-control extension
    * (delay 4+i cs), an image descriptor and a one-sub-block LZW body.
    * Frame i's image descriptor sits at byte 13 + 23*i + 8. */
  def syntheticGif(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13 + nFrames * 23 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(width.toShort).putShort(height.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // no GCT, bg, aspect
    var i = 0
    while (i < nFrames) {
      out.put(0x21.toByte).put(0xf9.toByte).put(4.toByte) // GCE, block size 4
      out.put(0.toByte).putShort((4 + i).toShort).put(0.toByte) // flags, delay, transp
      out.put(0.toByte) // GCE terminator
      out.put(0x2c.toByte)
      out.putShort(0.toShort).putShort(0.toShort) // x, y
      out.putShort(width.toShort).putShort(height.toShort)
      out.put(0.toByte) // no local color table
      out.put(2.toByte) // LZW minimum code size
      out.put(2.toByte).put(0x4c.toByte).put(0x01.toByte) // one 2-byte sub-block
      out.put(0.toByte) // image data terminator
      i += 1
    }
    out.put(0x3b.toByte)
    out.array()
  }
}
