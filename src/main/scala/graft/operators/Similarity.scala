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

  // ---------------- IVF (inverted-file) ANN ----------------

  /**
   * Deterministic k-means coarse quantizer trained distributed:
   * centroids init from evenly-strided vectors (seeded, order-stable),
   * then `iters` Lloyd rounds — each round is one groupBy(cell) over
   * the data with the (tiny) centroid table broadcast in the closure.
   * Returns the centroid matrix.
   */
  def trainIvfCentroids(df: DataFrame, k: Int, iters: Int = 3): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col("id"), asDouble(col("vec")).as("v"))
    val n = vecs.count()
    val stride = math.max(n / k, 1L)
    // deterministic init: every stride-th vector by id order
    var centroids = vecs.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("id"))))
      .filter((col("rk") - 1) % stride === 0)
      .limit(k)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
    for (_ <- 1 to iters) {
      val cb = centroids // stable snapshot for the closure
      val assignU = udf((v: Seq[Double]) => nearestCentroid(v.toArray, cb)._1)
      val updated = vecs.withColumn("cell", assignU(col("v")))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          array((0 until centroids(0).length).map(d =>
            sum(element_at(col("v"), d + 1))): _*).as("sums"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getAs[scala.collection.Seq[Double]]("sums").map(_ / r.getLong(1)).toArray)
        .toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** (cell index, cosine to that centroid). */
  def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): (Int, Double) = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cos = cosineLocal(v, centroids(c))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    (best, bestCos)
  }

  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** nProbe nearest cells of a vector (multi-probe IVF). */
  def probeCells(v: Array[Double], centroids: Array[Array[Double]], nProbe: Int): Array[Int] =
    centroids.indices.sortBy(c => -cosineLocal(v, centroids(c))).take(nProbe).toArray

  /**
   * IVF approximate top-k: candidates assigned to their nearest cell
   * (the inverted file), queries probe their `nProbe` nearest cells.
   * One shuffle on the cell key; per-cell candidate lists are ~n/k,
   * so cost scales with nProbe * n / k instead of n per query — the
   * named alternative scale path to hyperplane LSH.
   */
  def ivfTopK(df: DataFrame, k: Int, nCells: Int, nProbe: Int = 2,
      iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = trainIvfCentroids(df, nCells, iters)
    val assignU = udf((v: Seq[Double]) => nearestCentroid(v.toArray, centroids)._1)
    val probeU = udf((v: Seq[Double]) => probeCells(v.toArray, centroids, nProbe))
    val base = df.select(col("id"), asDouble(col("vec")).as("v"))
    val inverted = base.select(assignU(col("v")).as("cell"),
      col("id").as("cand_id"), col("v").as("cv"))
    val queries = base.select(col("id").as("query_id"), col("v").as("qv"),
        explode(probeU(col("v"))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    queries.join(inverted, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
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
