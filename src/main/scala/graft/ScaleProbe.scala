package graft

import graft.engine.{Rollup, TaskThroughputListener, Transcripts}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnostics: times individual stages of the tier build at
  * two parallelism levels to locate what stops scaling. Not part of
  * the driver contract. */
object ScaleProbe {

  private def session(master: String, shuffleParts: Int): SparkSession = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.executor.memory", "12g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val inPath = "target/bench/transcripts.parquet"
    val variants: Seq[(String, SparkSession => Unit)] = Seq(
      "scan_only" -> { s =>
        s.read.parquet(inPath).write.mode("overwrite").format("noop").save()
      },
      "carries_only" -> { s =>
        val series = Transcripts.series(s.read.parquet(inPath))
        series.groupBy(col("conv_id"), floor(col("t") / 60.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
            sum(col("m") * col("w")).as("smw"))
          .write.mode("overwrite").format("noop").save()
      },
      "collect_nofeat" -> { s =>
        val series = Transcripts.series(s.read.parquet(inPath))
        Rollup.tierFromTurns(series, 60L, features = Seq.empty)
          .write.mode("overwrite").format("noop").save()
      },
      "tier1m_full" -> { s =>
        val series = Transcripts.series(s.read.parquet(inPath))
        Rollup.tierFromTurns(series, 60L)
          .write.mode("overwrite").format("noop").save()
      },
      "tier1m_parquet" -> { s =>
        val series = Transcripts.series(s.read.parquet(inPath))
        Rollup.tierFromTurns(series, 60L)
          .write.mode("overwrite").parquet("target/bench/probe_tier")
      })

    val masters = sys.env.getOrElse("SPARK_GRAFT_PROBE_MASTERS",
      "local-cluster[1,8,13312]|8;local-cluster[4,8,13312]|32")
    masters.split(";").foreach { spec =>
      val Array(master, parts) = spec.split('|')
      val s = session(master, parts.toInt)
      // warm-up
      variants.last._2(s)
      variants.foreach { case (name, body) =>
        val l = new TaskThroughputListener
        s.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        body(s)
        val wall = (System.nanoTime() - t0) / 1e9
        s.sparkContext.removeSparkListener(l)
        println(f"PROBE $master $name%-16s wall=$wall%7.2fs cpu=${l.cpuTimeMs.sum() / 1000.0}%8.1fs gc=${l.gcTimeMs.sum() / 1000.0}%6.1fs")
      }
      s.stop()
    }
  }
}
