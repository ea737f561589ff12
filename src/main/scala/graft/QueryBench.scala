package graft

import org.apache.spark.sql.SparkSession

/** Iteration helper: time a subset of SparkEntry queries.
  * `runMain graft.QueryBench <sfDir> <q1,q2,...>` (empty list = all).
  * Same session config as Bench's query phase. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    // JVM/codegen warmup so the first timed query isn't charged ~5-7s
    SparkEntry.queries.get("q_simple_stats").foreach(f => f(spark, sfDir).count())
    val names = if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // two CONSECUTIVE passes per query; report the second (steady-
    // state, post-JIT, warm internal caches from its own cold pass —
    // not from 60 other queries' stacked persists, which are cleared
    // between queries so the battery's cache footprint stays bounded)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      var secs = 0.0; var n = -1L
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        n = try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage}"); -1L }
        secs = (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s $secs%8.3f s  ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
