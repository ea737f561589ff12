package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): per-pass timings for a
  * subset of SparkEntry queries with the SAME session config as
  * Bench's query phase, a `noop`-sink mode that computes every column
  * (guide §1.4) instead of count()'s pruned subtree, and
  * `.explain("formatted")` dumps for the plan evidence in plans/r06/.
  *
  * Usage:
  *   runMain graft.BenchExtra <sfDir> <q1,q2,...|all> [passes] [mode] [planTag]
  *     mode   = count | noop           (default count — Bench parity)
  *     planTag= e.g. "before"/"after"  (dumps plans/r06/<q>_<tag>.txt)
  *
  * This main is ADDITIVE: Bench.scala / Verify.scala are frozen for
  * measurement and untouched.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val passes = if (args.length > 2) args(2).toInt else 3
    val mode = if (args.length > 3) args(3) else "count"
    val planTag = if (args.length > 4) Some(args(4)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "6m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same JIT/codegen warm-up as Bench
    try SparkEntry.queries.get("q_simple_stats").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // per-pass job/task counters: at battery scale (5k docs / 100k
    // events) every query is fixed-cost-dominated, so the number of
    // Spark jobs and tasks IS the cost model worth optimizing
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        val minTasks = sys.env.get("SPARK_GRAFT_STAGE_MIN").map(_.toInt)
        if (sys.env.contains("SPARK_GRAFT_STAGE_DEBUG") &&
            ss.stageInfo.numTasks >= minTasks.getOrElse(64))
          println(s"[stage ${ss.stageInfo.stageId}] ${ss.stageInfo.numTasks} tasks: " +
            ss.stageInfo.name + " | rdds: " +
            ss.stageInfo.rddInfos.map(r => r.name + ":" + r.scope.map(_.name)
              .getOrElse("-")).mkString(", "))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (sys.env.contains("SPARK_GRAFT_STAGE_TIMES")) {
          val m = si.taskMetrics
          println(f"[stage-done ${si.stageId}] tasks=${si.numTasks} " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.3fs " +
            f"run=${m.executorRunTime / 1e3}%.3fs " +
            f"cpu=${m.executorCpuTime / 1e9}%.3fs " +
            f"deser=${m.executorDeserializeTime / 1e3}%.3fs " +
            f"gc=${m.jvmGCTime / 1e3}%.3fs " +
            f"fetch=${m.shuffleReadMetrics.fetchWaitTime / 1e3}%.3fs " +
            f"shRecs=${m.shuffleReadMetrics.recordsRead} " +
            si.name.takeWhile(_ != '$').take(40))
        }
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      planTag.foreach { tag =>
        val dir = new java.io.File("plans/r06"); dir.mkdirs()
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r06/${name}_$tag.txt"), plan)
        spark.catalog.clearCache()
      }
      val times = (1 to passes).map { pass =>
        spark.sparkContext.setJobDescription(s"$name pass $pass")
        val (j0, t0n) = (jobs.get(), tasks.get())
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (mode == "noop")
            df.write.format("noop").mode("overwrite").save()
          else df.count()
        } catch { case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage}")
        }
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, tasks.get() - t0n)
      }
      spark.sparkContext.setJobDescription(null)
      println(f"$name%-28s " +
        times.map(t => f"${t._1}%7.3f").mkString(" ") + "  s/pass   jobs " +
        times.map(t => f"${t._2}%3d").mkString(" ") + "   tasks " +
        times.map(t => f"${t._3}%5d").mkString(" "))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
