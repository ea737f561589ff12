package graft

import graft.engine.{Rollup, RollupBaselines, Transcripts}
import org.apache.spark.sql.SparkSession

/** Iteration probe for the rollup headline: builds the three tiers at
  * local[N] repeatedly under env-driven Spark confs and prints wall
  * seconds per round. `SPARK_PROBE_CONF` is a comma list of k=v Spark
  * confs layered over the Bench session config. */
object RollupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "320000").toLong
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val extra = sys.env.get("SPARK_PROBE_CONF").toSeq
      .flatMap(_.split(",").toSeq).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6m")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inPath = "target/bench/transcripts.parquet"
    if (!new java.io.File(inPath).exists()) {
      Transcripts.synthetic(spark, nConvs, meanTurns = 40, seed = 42L,
        partitions = 4 * cpus).write.mode("overwrite").parquet(inPath)
    }
    val nTurns = spark.read.parquet(inPath).count()
    def stage(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to rounds; variant <- Seq("native", "collect")) {
      val series = Transcripts.series(spark.read.parquet(inPath))
      val s1 = stage {
        (if (variant == "native") Rollup.tierFromTurns(series, 60L)
         else RollupBaselines.tierFromTurnsCollect(series, 60L))
          .write.mode("overwrite").parquet("target/bench/probe/tier=1m")
      }
      val s2 = stage {
        (if (variant == "native")
          Rollup.tierFromTier(spark.read.parquet("target/bench/probe/tier=1m"), 3600L)
        else RollupBaselines.tierFromTierCollect(spark.read.parquet("target/bench/probe/tier=1m"), 3600L))
          .write.mode("overwrite").parquet("target/bench/probe/tier=1h")
      }
      val s3 = stage {
        (if (variant == "native")
          Rollup.tierFromTier(spark.read.parquet("target/bench/probe/tier=1h"), 86400L)
        else RollupBaselines.tierFromTierCollect(spark.read.parquet("target/bench/probe/tier=1h"), 86400L))
          .write.mode("overwrite").parquet("target/bench/probe/tier=1d")
      }
      val secs = s1 + s2 + s3
      println(f"round $r $variant%-7s: $secs%6.2f s (1m=$s1%5.2f 1h=$s2%5.2f 1d=$s3%5.2f)  ${nTurns / secs}%.0f turns/s")
    }
    spark.stop()
  }
}
