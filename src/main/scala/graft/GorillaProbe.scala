package graft

import graft.engine.{Pipeline, Rollup, Transcripts}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measures Gorilla bytes/point on the bench transcript table's 1m tier
 * under the block-coalescing policy (Pipeline.gorillaChunks): day
 * blocks only (policy off), the density policy at its default
 * threshold, and all-week blocks — plus the roundtrip invariant on
 * every block. `runMain graft.GorillaProbe [threshold...]`; reuses
 * target/bench/transcripts.parquet when present (same seed-42
 * synthetic as Bench), else generates it.
 */
object GorillaProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inPath = "target/bench/transcripts.parquet"
    if (!new java.io.File(inPath).exists()) {
      val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "320000").toLong
      Transcripts.synthetic(spark, nConvs, meanTurns = 40, seed = 42L,
        partitions = 4 * cpus).write.mode("overwrite").parquet(inPath)
    }
    val t1m = Rollup.tierFromTurns(
      Transcripts.series(spark.read.parquet(inPath)), 60L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thresholds: Seq[(String, Double)] =
      Seq("day-only (policy off)" -> 0.0) ++
        (if (args.nonEmpty) args.toSeq.map(a => s"policy < $a pts/day" -> a.toDouble)
         else Seq("policy < 16 pts/day (default)" -> 16.0)) ++
        Seq("week-only" -> Double.MaxValue)
    for ((label, thr) <- thresholds) {
      val m = Pipeline.gorillaChunks(t1m, thr)
        .agg(count(lit(1)).as("blocks"), sum(col("n_points")).as("points"),
          sum(col("block_bytes")).as("bytes"),
          sum(when(col("block_days") === 7, 1L).otherwise(0L)).as("week_blocks"))
        .head()
      val (blocks, points, bytes, weeks) =
        (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))
      println(f"$label%-30s blocks=$blocks%9d (week: $weeks%9d) points=$points%10d " +
        f"bytes=$bytes%11d  ${bytes.toDouble / points}%6.3f B/pt  " +
        f"raw16x=${16.0 * points / bytes}%5.2fx")
    }
    // roundtrip invariant with the policy path active
    val bad = Pipeline.gorillaChunks(t1m, coalesceBelowPtsPerDay = 16.0)
      .withColumn("dec", graft.engine.Gorilla.decodeCol(col("block")))
      .filter(size(col("dec.ts")) =!= col("n_points")).count()
    println(s"roundtrip length mismatches under policy: $bad")
    spark.stop()
  }
}
