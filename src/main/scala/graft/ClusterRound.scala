package graft

import graft.engine.{Rollup, Transcripts}
import org.apache.spark.sql.SparkSession

/** ONE local-cluster measurement in a FRESH driver JVM — the child
  * process behind Bench's cluster phase. Measured (rounds 2-4): the
  * 8-executor level degrades up to 2x when its driver JVM has hosted
  * prior Spark sessions (heap bloat slows task scheduling, cost
  * scaling with executor count), and with all rounds sharing Bench's
  * driver the artifact drifted down two rounds in a row (0.827 ->
  * 0.784 -> 0.665) on an unchanged rollup path. A fresh driver per
  * measurement removes that confound; the remaining spread is host
  * noise, which the parent's interleaved best-of-N absorbs.
  *
  * Contract: `ClusterRound <executors> <inPath> <outRoot>`; runs one
  * discarded warm-up build (fresh executor JVMs pay JIT + codegen)
  * then one timed build, and prints a single
  * `CLUSTER_RESULT total=<secs> s1m=<secs>` line on stdout. */
object ClusterRound {
  def main(args: Array[String]): Unit = {
    val execs = args(0).toInt
    val inPath = args(1)
    val outRoot = args(2)
    val appCp = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,1,9216]")
      .config("spark.executor.memory", "4g")
      .config("spark.executor.extraClassPath", appCp)
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def staged(out: String): (Double, Double) = {
        val t0 = System.nanoTime()
        val series = Transcripts.series(spark.read.parquet(inPath))
        Rollup.tierFromTurns(series, 60L).write.mode("overwrite").parquet(s"$out/tier=1m")
        val t1 = System.nanoTime()
        Rollup.tierFromTier(spark.read.parquet(s"$out/tier=1m"), 3600L)
          .write.mode("overwrite").parquet(s"$out/tier=1h")
        Rollup.tierFromTier(spark.read.parquet(s"$out/tier=1h"), 86400L)
          .write.mode("overwrite").parquet(s"$out/tier=1d")
        ((System.nanoTime() - t0) / 1e9, (t1 - t0) / 1e9)
      }
      staged(s"$outRoot/cwarm_$execs") // discarded fresh-JVM warm-up
      val (total, s1m) = staged(s"$outRoot/ctiers_$execs")
      println(f"CLUSTER_RESULT total=$total%.3f s1m=$s1m%.3f")
    } finally spark.stop()
  }
}
