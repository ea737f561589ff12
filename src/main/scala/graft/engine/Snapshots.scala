package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Iceberg-style snapshot + per-partition lineage manifests over
 * hash-bucketed Parquet (no Iceberg jar ships in this image, so the
 * commit protocol is emulated — SURVEY.md §7: snapshot commit by
 * atomic rename, rebuild resumes from the last committed snapshot).
 *
 * Layout under `root`:
 *   tier=<name>/part=<k>/  (parquet)    hash(conv_id) % nParts buckets
 *   _lineage/<tier>/snap-<id>.json      committed snapshot (atomic mv)
 *
 * A snapshot records, per committed partition: row count and an
 * order-independent content checksum (sum of per-row xxhash64), plus
 * the input fingerprint — a rerun against the same input skips
 * committed partitions entirely (idempotent resume); a rerun against
 * different input invalidates all of them.
 */
object Snapshots {

  final case class PartManifest(part: Int, rows: Long, checksum: Long)
  final case class Snapshot(id: Long, tier: String, inputFingerprint: String,
      parts: Seq[PartManifest])

  // -------- tiny JSON (no external deps) --------

  private def renderJson(s: Snapshot): String = {
    val parts = s.parts.sortBy(_.part)
      .map(p => s"""{"part":${p.part},"rows":${p.rows},"checksum":${p.checksum}}""")
      .mkString("[", ",", "]")
    s"""{"id":${s.id},"tier":"${s.tier}","input":"${s.inputFingerprint}","parts":$parts}"""
  }

  private val SnapRe =
    """\{"id":(\d+),"tier":"([^"]*)","input":"([^"]*)","parts":\[(.*)\]\}""".r
  private val PartRe =
    """\{"part":(\d+),"rows":(\d+),"checksum":(-?\d+)\}""".r

  private def parseJson(s: String): Snapshot = s.trim match {
    case SnapRe(id, tier, input, parts) =>
      val pms = PartRe.findAllMatchIn(parts)
        .map(m => PartManifest(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
        .toSeq
      Snapshot(id.toLong, tier, input, pms)
    case other => throw new IllegalArgumentException(s"bad snapshot json: $other")
  }

  // -------- store --------

  final class Store(val root: String) {
    private def lineageDir(tier: String): Path = Paths.get(root, "_lineage", tier)

    def tierDir(tier: String): String = s"$root/tier=$tier"

    def lastSnapshot(tier: String): Option[Snapshot] = {
      val dir = lineageDir(tier)
      if (!Files.isDirectory(dir)) return None
      val snaps = Files.list(dir).iterator.asScala
        .filter(_.getFileName.toString.matches("snap-\\d+\\.json"))
        .toSeq.sortBy(_.getFileName.toString)
      snaps.lastOption.map(p => parseJson(Files.readString(p)))
    }

    /** Atomic commit: write tmp then rename into place. */
    def commit(snap: Snapshot): Unit = {
      val dir = lineageDir(snap.tier)
      Files.createDirectories(dir)
      val name = f"snap-${snap.id}%06d.json"
      val tmp = dir.resolve(name + ".tmp")
      Files.writeString(tmp, renderJson(snap))
      Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Order-independent content checksum of a partition: XOR of
    * per-row xxhash64 over the named columns (overflow-free under
    * ANSI mode; tier rows are unique on (conv_id, bucket) so XOR
    * cancellation can't hide duplicates — the row count catches any). */
  private def checksumAgg(cols: Seq[String]): org.apache.spark.sql.Column =
    bit_xor(xxhash64(cols.map(col): _*))

  /**
   * Resumable tier materialization. `build` maps the pending-filtered
   * turn series to the tier DataFrame; partitions are
   * `pmod(xxhash64(conv_id), nParts)` so a partition is a closed set
   * of conversations (a tier row never straddles partitions).
   *
   * Returns the set of partitions processed this run (empty = already
   * fully committed). `maxPartsPerRun` throttles work per invocation —
   * calling repeatedly converges, which is also how the resume test
   * simulates mid-job death.
   */
  def buildResumable(
      spark: SparkSession,
      series: DataFrame,
      tierName: String,
      build: DataFrame => DataFrame,
      store: Store,
      inputFingerprint: String,
      nParts: Int,
      maxPartsPerRun: Int = Int.MaxValue): Set[Int] = {
    val prev = store.lastSnapshot(tierName)
      .filter(_.inputFingerprint == inputFingerprint)
    val committed = prev.map(_.parts.map(_.part).toSet).getOrElse(Set.empty)
    val pendingAll = (0 until nParts).toSet -- committed
    if (pendingAll.isEmpty) return Set.empty
    val pending = pendingAll.toSeq.sorted.take(maxPartsPerRun).toSet

    val partCol = pmod(xxhash64(col("conv_id")), lit(nParts)).cast("int")
    val subset = series.withColumn("part", partCol)
      .filter(col("part").isin(pending.toSeq: _*))
    val tier = build(subset.drop("part"))
      .withColumn("part", pmod(xxhash64(col("conv_id")), lit(nParts)).cast("int"))

    // dynamic partition overwrite: reruns of an uncommitted partition
    // replace, not duplicate, its files
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tier.write.mode("overwrite").partitionBy("part").parquet(store.tierDir(tierName))

    // lineage from what actually landed on disk
    val written = spark.read.parquet(store.tierDir(tierName))
      .filter(col("part").isin(pending.toSeq: _*))
    val manifests = written.groupBy(col("part"))
      .agg(count(lit(1)).as("rows"),
        checksumAgg(written.columns.filterNot(_ == "part").toSeq).as("checksum"))
      .collect()
      .map(r => PartManifest(r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq

    val snapId = prev.map(_.id + 1).getOrElse(
      store.lastSnapshot(tierName).map(_.id + 1).getOrElse(1L))
    val allParts = (prev.map(_.parts).getOrElse(Seq.empty) ++ manifests).sortBy(_.part)
    store.commit(Snapshot(snapId, tierName, inputFingerprint, allParts))
    pending
  }
}
