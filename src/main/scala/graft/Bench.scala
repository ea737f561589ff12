package graft

import graft.engine.{Rollup, TaskThroughputListener, Transcripts}
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main. Emits ONE JSON line:
 *  - `queries`: per-query seconds for the SparkEntry battery on
 *    SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS (driver contract);
 *  - `rollup`: the north-rule metric — turns/sec building all three
 *    retention tiers (1m/1h/1d, features + carries + parquet sink)
 *    over a deterministic synthetic transcript table, measured at two
 *    parallelism levels (local[N] and local[4N], shuffle.partitions
 *    matched), plus scaling efficiency thr_4N / (4 * thr_N) — the
 *    sandbox substitute for the N vs 4N executor protocol
 *    (BASELINE.md "Two-cluster-size protocol").
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Build + write all three tiers; returns wall seconds. */
  private def buildTiers(spark: SparkSession, inPath: String, outRoot: String): Double = {
    val t0 = System.nanoTime()
    val series = Transcripts.series(spark.read.parquet(inPath))
    val t1m = Rollup.tierFromTurns(series, 60L)
    t1m.write.mode("overwrite").parquet(s"$outRoot/tier=1m")
    val back1m = spark.read.parquet(s"$outRoot/tier=1m")
    val t1h = Rollup.tierFromTier(back1m, 3600L)
    t1h.write.mode("overwrite").parquet(s"$outRoot/tier=1h")
    val back1h = spark.read.parquet(s"$outRoot/tier=1h")
    Rollup.tierFromTier(back1h, 86400L)
      .write.mode("overwrite").parquet(s"$outRoot/tier=1d")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    val lowCpus = math.max(cpus / 4, 1)

    // ---- phase 1: driver query battery ----
    val spark0 = session(cpus)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark0, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- phase 2: rollup scaling (north rule) ----
    // deterministic input, pre-written so generation is excluded
    val benchRoot = "target/bench"
    val inPath = s"$benchRoot/transcripts.parquet"
    Transcripts.synthetic(spark0, nConvs, meanTurns = 40, seed = 42L, partitions = cpus)
      .write.mode("overwrite").parquet(inPath)
    val nTurns = spark0.read.parquet(inPath).count()
    spark0.stop()

    def measure(c: Int): (Double, String) = {
      val s = session(c)
      val listener = new TaskThroughputListener
      s.sparkContext.addSparkListener(listener)
      // warm-up (discarded): JIT + codegen + parquet footer caches
      buildTiers(s, inPath, s"$benchRoot/warm_$c")
      val secs = buildTiers(s, inPath, s"$benchRoot/tiers_$c")
      s.stop()
      (secs, listener.json)
    }

    val (secsLow, metricsLow) = measure(lowCpus)
    val (secsHigh, metricsHigh) = measure(cpus)
    val thrLow = nTurns / secsLow
    val thrHigh = nTurns / secsHigh
    val eff = thrHigh / ((cpus.toDouble / lowCpus) * thrLow)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val rollup =
      s"""{"turns":$nTurns,"cpus_low":$lowCpus,"cpus_high":$cpus,""" +
        s""""secs_low":${f"$secsLow%.3f"},"secs_high":${f"$secsHigh%.3f"},""" +
        s""""turns_per_sec_low":${f"$thrLow%.1f"},"turns_per_sec_high":${f"$thrHigh%.1f"},""" +
        s""""scaling_efficiency":${f"$eff%.3f"},""" +
        s""""partition_metrics_low":$metricsLow,"partition_metrics_high":$metricsHigh}"""
    println(
      s"""{"metric":"rollup_turns_per_sec","value":${f"$thrHigh%.1f"},"unit":"turns/sec",""" +
        s""""queries":$qs,"total_query_sec":${f"$total%.3f"},"rollup":$rollup,"sf":"$sfDir"}""")
  }
}
