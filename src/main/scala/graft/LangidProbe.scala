package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r06 plan probe: the languageId TRAINING plan (the profile cut) is
  * not visible in q_docs_langid's battery plan — training runs eagerly
  * inside languageId via collect(), so the returned DataFrame only
  * carries the scoring UDF. This main dumps the profile DataFrame's
  * physical plan (plans/r06/langid_profile_<tag>.txt), the artifact
  * the window-to-bounded-heap change is judged on.
  * Usage: runMain graft.LangidProbe <sfDir> <tag> */
object LangidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val tag = if (args.length > 1) args(1) else "after"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val profile =
      graft.operators.TextStats.languageProfile(docs.select(col("doc_id"),
        col("text"), col("lang")), "text", "lang", 64)
    new java.io.File("plans/r06").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"plans/r06/langid_profile_$tag.txt"),
      profile.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println(s"wrote plans/r06/langid_profile_$tag.txt")
    spark.stop()
  }
}
