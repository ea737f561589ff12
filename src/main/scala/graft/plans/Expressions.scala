package graft.plans

import graft.ref.LightCurve
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/**
 * Native Catalyst expressions for the kernels Spark lacks — the
 * custom-Expression tier of the operator preference order (faster
 * than a Scala UDF: no encoder boundary, participates in whole-stage
 * codegen; SURVEY.md §4 "custom Expression" row).
 */

/** `ln(erfc(x))` — the Anderson-Darling inner transcendental
  * (reference lnerfc.rs); full codegen via a static call. */
case class LnErfcExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ln_erfc expects DOUBLE, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    graft.ref.LnErfc(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ref.LnErfc$$.MODULE$$.apply($c)")
  override protected def withNewChildInternal(newChild: Expression): LnErfcExpression =
    copy(child = newChild)
  override def prettyName: String = "ln_erfc"
}

/** Exact R-5 quantile (`h = n q - 0.5`, linear interpolation —
  * reference sorted_array.rs:50-70) over a pre-sorted double array;
  * none of Spark's percentile builtins implement this convention. */
case class R5PpfExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"r5_ppf expects (ARRAY<DOUBLE>, DOUBLE), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(arr: Any, q: Any): Any =
    LightCurve.ppf(arr.asInstanceOf[ArrayData].toDoubleArray(), q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, q) =>
      s"graft.ref.LightCurve$$.MODULE$$.ppf($a.toDoubleArray(), $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): R5PpfExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "r5_ppf"
}

/** Dot product of two ARRAY<DOUBLE> columns — the ANN hot-path scalar.
  * Spark's higher-order `aggregate(zip_with(..))` form is
  * CodegenFallback (interpreted, allocates the zipped array per pair);
  * this expression is a single codegen'd loop over the unsafe array
  * data. Summation order is ascending index, identical to the HOF
  * left-fold, so values are bit-equal to the declarative form. */
case class VecDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VecOps$$.MODULE$$.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** splitmix64 finalizer over a LONG column — the deterministic
  * per-row uniform hash behind the stratified sampler. ANSI mode
  * forbids wrapping `*` on longs in plain Catalyst arithmetic, so the
  * mix lives in a static call that stays inside whole-stage codegen.
  * Bit-identical to [[graft.operators.Dedup.mix64]] (the DuckDB
  * mirror is `DuckMacros.mix64`). */
case class Mix64Expression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mix64 expects BIGINT, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    graft.operators.Dedup.mix64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Dedup$$.MODULE$$.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64Expression =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

object VecOps {
  /** Ascending-index dot product over Catalyst array data. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Injects the native expressions into a session's function registry —
  * usable via `spark.sql.extensions=graft.plans.GraftExtensions` or
  * [[GraftExtensions.register]] on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.lnErfcFn)
    ext.injectFunction(GraftExtensions.r5PpfFn)
    ext.injectFunction(GraftExtensions.vecDotFn)
    ext.injectFunction(GraftExtensions.mix64Fn)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans", null, name, usage, "", "", "", "", "", "", "built-in")

  private[plans] val lnErfcFn =
    (FunctionIdentifier("ln_erfc"),
      info("ln_erfc", "ln_erfc(x) - natural log of the complementary error function"),
      (args: Seq[Expression]) => LnErfcExpression(args.head))

  private[plans] val r5PpfFn =
    (FunctionIdentifier("r5_ppf"),
      info("r5_ppf", "r5_ppf(sorted_array, q) - exact R-5 quantile"),
      (args: Seq[Expression]) => R5PpfExpression(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1), DoubleType)))

  private[plans] val vecDotFn =
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => VecDotExpression(args.head, args(1)))

  private[plans] val mix64Fn =
    (FunctionIdentifier("mix64"),
      info("mix64", "mix64(z) - splitmix64 finalizer of a 64-bit value"),
      (args: Seq[Expression]) => Mix64Expression(args.head))

  /** Size-adaptive partitioning for the engine's persisted ARTIFACT
    * tables (signature / inverted-index / rep caches). Spark pins a
    * cached plan's output partitioning by default
    * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` =
    * false), so a persisted table materializes at the session's full
    * shuffle-partition count no matter how small it is — and every
    * downstream stage over the cache then runs one task per pinned
    * partition (measured, r06 probe: 256-task stages over KB-sized
    * signature caches, ~1.5k tasks per battery query; enabling
    * in-cache AQE coalescing cut q_embed_ann_lsh from 1545 to 14
    * steady-pass tasks). Letting AQE coalesce inside cached plans
    * sizes the artifact like every other exchange — by BYTES, at any
    * scale; this removes a fixed partition count rather than tuning
    * one, so it is the opposite of a local-only setting. Runtime
    * conf; operators that persist call this before planning. */
  def adaptiveArtifactPartitioning(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("ln_erfc",
      args => LnErfcExpression(args.head), "scala_udf")
    registry.createOrReplaceTempFunction("r5_ppf",
      args => R5PpfExpression(args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1), DoubleType)), "scala_udf")
    registry.createOrReplaceTempFunction("vec_dot",
      args => VecDotExpression(args.head, args(1)), "scala_udf")
    registry.createOrReplaceTempFunction("mix64",
      args => Mix64Expression(args.head), "scala_udf")
  }
}
