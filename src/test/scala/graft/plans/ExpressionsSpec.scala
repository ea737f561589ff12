package graft.plans

import graft.ref.{LightCurve, LnErfc}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: correct values, registered both via
  * SparkSessionExtensions and on a live session, and codegen-clean
  * (no fallback to interpreted evaluation in the physical plan). */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    // getOrCreate may return a session another suite built (one JVM per
    // test run), where the spark.sql.extensions config never applies —
    // register explicitly, as library users on shared sessions would
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("native-exprs")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("the SparkSessionExtensions hook injects both functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders wired
  }

  test("ln_erfc matches the reference port across branches") {
    val xs = Seq(-3.0, -0.5, 0.0, 0.01, 0.5, 2.0, 7.9, 8.1, 25.0)
    import spark.implicits._
    val got = xs.toDF("x").selectExpr("ln_erfc(x) AS y").collect().map(_.getDouble(0))
    got.zip(xs.map(LnErfc(_))).foreach { case (g, e) =>
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(e))
    }
  }

  test("r5_ppf matches the reference quantile on the deciles golden") {
    // sorted_array.rs:182-190: linspace(0,1,11) deciles under R-5
    val arr = (0 to 10).map(_ / 10.0)
    val expected = Seq(0.0, 0.06, 0.17, 0.28, 0.39, 0.5, 0.61, 0.72, 0.83, 0.94, 1.0)
    import spark.implicits._
    val qs = (0 to 10).map(_ / 10.0)
    val got = qs.toDF("q")
      .withColumn("arr", typedLit(arr))
      .selectExpr("r5_ppf(arr, q) AS v")
      .collect().map(_.getDouble(0))
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    // and bit-match the Scala port on random input
    val rng = new scala.util.Random(8)
    val sorted = Array.fill(57)(rng.nextDouble() * 40 - 20).sorted
    val gotR = Seq(0.05, 0.25, 0.5, 0.95).toDF("q")
      .withColumn("arr", typedLit(sorted.toSeq))
      .selectExpr("r5_ppf(arr, q) AS v").collect().map(_.getDouble(0))
    gotR.zip(Seq(0.05, 0.25, 0.5, 0.95).map(LightCurve.ppf(sorted, _))).foreach {
      case (g, e) => assert(g == e)
    }
  }

  test("expressions stay inside whole-stage codegen") {
    val df = spark.range(1, 100)
      .selectExpr("ln_erfc(CAST(id AS DOUBLE) / 50.0) AS y")
      .filter(col("y") < 0.0)
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [ln_erfc"), s"expression not codegen-fused:\n$plan")
    assert(df.count() > 0)
  }

  test("register() works on a session built without the extensions config") {
    val plain = spark.newSession()
    GraftExtensions.register(plain)
    val v = plain.sql("SELECT ln_erfc(CAST(1.0 AS DOUBLE)) AS v").collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(v) ==
      java.lang.Double.doubleToLongBits(LnErfc(1.0)))
  }

  test("type errors are rejected at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT ln_erfc('not a double')").collect()
    }
  }

  test("bounded-heap top-k equals the window ranking at any partitioning") {
    import org.apache.spark.sql.GraftSqlBridge
    import spark.implicits._
    // ties included on purpose: equal scores must rank by id ascending
    val rng = new scala.util.Random(7)
    val rows = for (q <- 0L until 7L; c <- 0L until 200L)
      yield (q, c, math.rint(rng.nextDouble() * 20) / 20.0)
    val expected = rows.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(r => (-r._3, r._2)).take(5)
        .zipWithIndex.map { case ((_, c, s), i) => (c, s, i + 1) }
    }
    for (parts <- Seq(1, 2, 16)) {
      val df = spark.createDataset(rows).toDF("query_id", "cand_id", "cosine")
        .repartition(parts)
      val agg = TopKAggExpr(
        GraftSqlBridge.expressionOf(col("cosine")),
        GraftSqlBridge.expressionOf(col("cand_id")), 5)
      val got = df.groupBy(col("query_id"))
        .agg(GraftSqlBridge.aggColumn(agg).as("topk"))
        .select(col("query_id"), explode(col("topk")).as("e"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) =>
          q -> rs.map(r => (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1),
            r.getStruct(1).getInt(2))).sortBy(_._3).toSeq
        }
      assert(got == expected, s"parts=$parts")
    }
  }

  test("top-k buffer survives serialize/deserialize round-trips") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 4L), (0.9, 2L), (0.1, 9L), (0.7, 1L))
      .foreach { case (s, i) => b.insert(s, i) }
    val expr = TopKAggExpr(null, null, 3)
    val rt = expr.deserialize(expr.serialize(b))
    assert(rt.sortedDesc().toSeq == Seq((2L, 0.9), (4L, 0.9), (1L, 0.7)))
  }

  test("bounded token top-k equals the (count desc, token asc) window ranking") {
    import org.apache.spark.sql.GraftSqlBridge
    import spark.implicits._
    // heavy count ties on purpose: the tie-break must be the token's
    // BINARY order, exactly what the window's string sort used
    val rng = new scala.util.Random(11)
    val rows = for (l <- 0 until 4; t <- 0 until 300)
      yield (s"lang$l", f"tok${rng.nextInt(200)}%03d", 1L + rng.nextInt(5))
    val counted = rows.groupBy(r => (r._1, r._2))
      .map { case ((l, t), rs) => (l, t, rs.map(_._3).sum) }.toSeq
    val expected = counted.groupBy(_._1).map { case (l, rs) =>
      l -> rs.sortBy(r => (-r._3, r._2)).take(7).map(r => (r._2, r._3))
    }
    for (parts <- Seq(1, 2, 16)) {
      val df = spark.createDataset(counted).toDF("lang", "token", "count")
        .repartition(parts)
      val agg = TopKTokAggExpr(
        GraftSqlBridge.expressionOf(col("count")),
        GraftSqlBridge.expressionOf(col("token")), 7)
      val got = df.groupBy(col("lang"))
        .agg(GraftSqlBridge.aggColumn(agg).as("topk"))
        .select(col("lang"), explode(col("topk")).as("e"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (l, rs) =>
          l -> rs.map(r => (r.getStruct(1).getString(0),
            r.getStruct(1).getLong(1))).toSeq
        }
      assert(got == expected, s"parts=$parts")
    }
  }

  test("token top-k buffer survives serialize/deserialize round-trips") {
    import org.apache.spark.unsafe.types.UTF8String
    val b = new TopKTokBuffer(3)
    Seq((5L, "bb"), (9L, "zz"), (9L, "aa"), (1L, "qq"), (7L, "mm"))
      .foreach { case (c, t) => b.insert(c, UTF8String.fromString(t)) }
    val expr = TopKTokAggExpr(null, null, 3)
    val rt = expr.deserialize(expr.serialize(b))
    assert(rt.sortedDesc().toSeq.map { case (t, c) => (t.toString, c) } ==
      Seq(("aa", 9L), ("zz", 9L), ("mm", 7L)))
  }
}
