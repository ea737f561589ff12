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
}
