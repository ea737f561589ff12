package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`):
 * brute-force cosine top-k as the exact baseline, and random-
 * hyperplane LSH bucketing as the approximate scale path (candidates
 * restricted to same-bucket vectors — at 100 TB the bucket join
 * replaces the all-pairs cross join; recall tuned by plane count /
 * multi-probe).
 *
 * Dot products are pure Catalyst higher-order functions
 * (`zip_with` + `aggregate`) — codegen'd, no UDF in the hot path.
 * Only the hyperplane signature (tiny, per-row) is a UDF.
 */
object Similarity {

  /** Cast float array to double for stable math. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact brute-force top-k: for each query row, rank all candidate
   * rows by cosine (desc, id asc tie-break). Queries are broadcast —
   * the candidate side stays partitioned, so the scan distributes.
   */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("query_id"), asDouble(col("vec")).as("qv"))
    val c = candidates.select(col("id").as("cand_id"), asDouble(col("vec")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * +-1 from the splitmix64 mix of a fixed seed. */
  private def planeComponent(seed: Long, plane: Int, dim: Int): Double =
    if ((Dedup.mix64(seed ^ (plane.toLong << 32) ^ dim.toLong) & 1L) == 0L) 1.0 else -1.0

  /** Random-hyperplane (sign) LSH signature of a vector: bit p set
    * when dot(vec, r_p) > 0. */
  def hyperplaneSignature(vec: Seq[Double], planes: Int, seed: Long): Int = {
    var sig = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < vec.length) { s += vec(d) * planeComponent(seed, p, d); d += 1 }
      if (s > 0.0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  def signatureUdf(planes: Int, seed: Long = 7L):
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Double]) => hyperplaneSignature(v, planes, seed))

  /**
   * Multi-table LSH approximate top-k: `tables` independent
   * hyperplane signatures per vector (standard L-table LSH — a true
   * neighbor is a candidate if it collides in ANY table, recall
   * 1-(1-p^planes)^tables). One shuffle on the (table, bucket) key;
   * per-bucket candidate sets are ~n / 2^planes, so the join cost is
   * planes/tables-tunable and never globally quadratic.
   */
  def lshTopK(df: DataFrame, planes: Int, k: Int, tables: Int = 4,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigsU = udf((v: Seq[Double]) =>
      Array.tabulate(tables)(tb => hyperplaneSignature(v, planes, seed + 1000L * tb)))
    val withSig = df.select(col("id"), asDouble(col("vec")).as("v"))
      .select(col("id"), col("v"), posexplode(sigsU(col("v"))).as(Seq("table", "bucket")))
    val a = withSig.select(col("table"), col("bucket"),
      col("id").as("query_id"), col("v").as("qv"))
    val b = withSig.select(col("table"), col("bucket"),
      col("id").as("cand_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }
}
