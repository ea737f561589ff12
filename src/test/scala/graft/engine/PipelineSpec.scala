package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end north-star flow: resumable tier cascade + gap-fill +
  * gorilla chunks; reruns are no-ops; content matches direct builds. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-e2e")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("full pipeline builds all stages, resumes as a no-op, and matches direct builds") {
    val inPath = Files.createTempDirectory("pipe-in").toString + "/turns.parquet"
    val outRoot = Files.createTempDirectory("pipe-out").toString
    Transcripts.synthetic(spark, nConvs = 40, meanTurns = 30, seed = 41L)
      .write.mode("overwrite").parquet(inPath)

    val first = Pipeline.run(spark, inPath, outRoot, nParts = 6)
    assert(first.map(_.stage) ==
      Seq("tier_1m", "tier_1h", "tier_1d", "gapfill_1h", "gorilla_1m"))
    first.foreach { r =>
      assert(r.processedParts == (0 until 6).toSet, s"${r.stage} parts")
      assert(r.rows > 0, s"${r.stage} rows")
    }

    // rerun: every stage already committed -> no partitions processed
    val second = Pipeline.run(spark, inPath, outRoot, nParts = 6)
    second.foreach(r => assert(r.processedParts.isEmpty, s"${r.stage} not a no-op"))
    // row counts unchanged
    first.zip(second).foreach { case (a, b) => assert(a.rows == b.rows) }

    // content equals direct (non-resumable) builds
    val series = Transcripts.series(spark.read.parquet(inPath))
    val direct = Rollup.tierFromTier(Rollup.tierFromTurns(series, 60L), 3600L)
      .orderBy(col("conv_id"), col("bucket")).collect().map(_.mkString("|")).toSeq
    val piped = spark.read.parquet(s"$outRoot/tier=1h").drop("part")
      .select(direct.headOption.map(_ => col("*")).getOrElse(col("*")))
      .orderBy(col("conv_id"), col("bucket")).collect().map(_.mkString("|")).toSeq
    assert(piped == direct)

    // gorilla chunks decode back to the committed 1m points
    val chunks = spark.read.parquet(s"$outRoot/tier=1m_gorilla")
    assert(chunks.count() > 0)
    val sample = chunks.limit(5).withColumn("dec", Gorilla.decodeCol(col("block"))).collect()
    sample.foreach { r =>
      val n = r.getAs[Long]("n_points")
      assert(r.getStruct(r.fieldIndex("dec")).getAs[scala.collection.Seq[Long]]("ts").size == n)
    }

    // throttled resume converges for the whole pipeline too: each run
    // advances at most 3 parts per stage, gated so a stage only starts
    // once its upstream snapshot is complete; 6 parts / 3 per run with
    // in-run advancement past freshly-completed gates -> 4 passes
    val outRoot2 = Files.createTempDirectory("pipe-out2").toString
    var runs = 0
    while (Pipeline.run(spark, inPath, outRoot2, nParts = 6, maxPartsPerRun = 3)
        .exists(_.processedParts.nonEmpty) && runs < 20) { runs += 1 }
    assert(runs == 4, s"expected 4 throttled passes, took $runs")
    val a = spark.read.parquet(s"$outRoot/tier=1d").drop("part")
      .orderBy(col("conv_id"), col("bucket")).collect().map(_.mkString("|")).toSeq
    val b = spark.read.parquet(s"$outRoot2/tier=1d").drop("part")
      .orderBy(col("conv_id"), col("bucket")).collect().map(_.mkString("|")).toSeq
    assert(a == b)
  }
}
