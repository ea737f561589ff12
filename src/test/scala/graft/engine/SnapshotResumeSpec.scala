package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Resume-from-snapshot semantics: a tier rebuild that dies mid-job
  * (simulated by throttling partitions per run) converges over reruns
  * to exactly the single-shot result, never rewrites committed
  * partitions, and skips everything when fully committed. */
class SnapshotResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("snapshot-resume")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def tierText(df: DataFrame): Seq[String] =
    df.drop("part").orderBy(col("conv_id"), col("bucket"))
      .collect().toSeq.map(_.mkString("|"))

  test("throttled rebuild converges to the single-shot tier and skips committed parts") {
    val series = Transcripts.series(
      Transcripts.synthetic(spark, nConvs = 40, meanTurns = 30, seed = 23L).toDF).cache()
    val build = (s: DataFrame) => Rollup.tierFromTurns(s, 60L)
    val nParts = 8

    // single-shot truth
    val oneShotRoot = tmpDir("snap-oneshot").toString
    val store1 = new Snapshots.Store(oneShotRoot)
    val done1 = Snapshots.buildResumable(spark, series, "1m", build, store1, "fp-v1", nParts)
    assert(done1 == (0 until nParts).toSet)

    // throttled: at most 3 parts per invocation (simulated mid-job death)
    val root = tmpDir("snap-throttle").toString
    val store = new Snapshots.Store(root)
    var runs = 0
    var processed = Set.empty[Int]
    var last = Set(-1)
    while (last.nonEmpty && runs < 10) {
      last = Snapshots.buildResumable(spark, series, "1m", build, store, "fp-v1",
        nParts, maxPartsPerRun = 3)
      assert((processed & last).isEmpty, "a committed part was reprocessed")
      processed ++= last
      runs += 1
    }
    assert(processed == (0 until nParts).toSet)
    assert(runs == 4) // 3 + 3 + 2 + empty

    // identical content
    val got = tierText(spark.read.parquet(store.tierDir("1m")))
    val exp = tierText(spark.read.parquet(store1.tierDir("1m")))
    assert(got == exp)

    // identical lineage manifests (rows + checksums per part)
    val snapA = store.lastSnapshot("1m").get
    val snapB = store1.lastSnapshot("1m").get
    assert(snapA.parts.sortBy(_.part) == snapB.parts.sortBy(_.part))

    // committed parts are not rewritten: file mtimes stable across a no-op rerun
    val partFiles = Files.walk(java.nio.file.Paths.get(store.tierDir("1m")))
      .iterator.asScala.filter(_.toString.endsWith(".parquet")).toSeq
    val mtimes = partFiles.map(p => p -> Files.getLastModifiedTime(p)).toMap
    val none = Snapshots.buildResumable(spark, series, "1m", build, store, "fp-v1", nParts)
    assert(none.isEmpty)
    partFiles.foreach(p => assert(Files.getLastModifiedTime(p) == mtimes(p)))
    series.unpersist()
  }

  test("changed input fingerprint invalidates all partitions") {
    val series = Transcripts.series(
      Transcripts.synthetic(spark, nConvs = 10, meanTurns = 15, seed = 29L).toDF)
    val build = (s: DataFrame) => Rollup.tierFromTurns(s, 60L)
    val root = tmpDir("snap-fp").toString
    val store = new Snapshots.Store(root)
    assert(Snapshots.buildResumable(spark, series, "1m", build, store, "fp-v1", 4).size == 4)
    assert(Snapshots.buildResumable(spark, series, "1m", build, store, "fp-v1", 4).isEmpty)
    // new input version -> full rebuild
    assert(Snapshots.buildResumable(spark, series, "1m", build, store, "fp-v2", 4).size == 4)
  }
}
