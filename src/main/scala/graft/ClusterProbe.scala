package graft
import graft.engine.{Rollup, Transcripts}
import org.apache.spark.sql.SparkSession
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val execs = if (args.nonEmpty) args(0).toInt else 4
    val appCp = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,${sys.env.getOrElse("SPARK_PROBE_CORES","2")},9216]")
      .config("spark.executor.memory", sys.env.getOrElse("SPARK_PROBE_EXEC_MEM", "8g"))
      .config("spark.executor.extraClassPath", appCp)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_PROBE_PARTS", "256").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Thread.sleep(3000)
    println("EXECUTORS: " + spark.sparkContext.getExecutorMemoryStatus.keys.mkString(", "))
    val inPath = "target/bench/transcripts_half.parquet"
    def full(tag: String): Unit = {
      val t0 = System.nanoTime()
      val series = Transcripts.series(spark.read.parquet(inPath))
      val s1 = System.nanoTime()
      Rollup.tierFromTurns(series, 60L)
        .write.mode("overwrite").parquet("target/bench/cprobe/tier=1m")
      val s2 = System.nanoTime()
      Rollup.tierFromTier(spark.read.parquet("target/bench/cprobe/tier=1m"), 3600L)
        .write.mode("overwrite").parquet("target/bench/cprobe/tier=1h")
      val s3 = System.nanoTime()
      Rollup.tierFromTier(spark.read.parquet("target/bench/cprobe/tier=1h"), 86400L)
        .write.mode("overwrite").parquet("target/bench/cprobe/tier=1d")
      val s4 = System.nanoTime()
      println(f"$tag total ${(s4-t0)/1e9}%.2f s (1m=${(s2-s1)/1e9}%.2f 1h=${(s3-s2)/1e9}%.2f 1d=${(s4-s3)/1e9}%.2f)")
    }
    full("warm")
    full("timed")
    println("EXECUTORS AFTER: " + spark.sparkContext.getExecutorMemoryStatus.keys.mkString(", "))
    spark.stop()
  }
}
