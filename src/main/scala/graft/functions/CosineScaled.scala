package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd cosine similarity over two float-array columns with
  * the engine's exact integer-scaling semantics (round(x·10⁶) → 64-bit
  * dot/norm sums → one divide+sqrt; see [[graft.ops.Similarity]]).
  *
  * WHY CUSTOM (SURVEY §2.10 said "only if perf demands"): the composable
  * form `aggregate(zip_with(a,b,*), 0L, +)` materializes an intermediate
  * ArrayData per row and boxes through the higher-order-function
  * machinery; this expression fuses scale+dot+norms into one primitive
  * loop over the columnar float arrays — the hot path of a 10⁹-vector
  * similarity scan. Same result, same nullability, drop-in.
  *
  * Rounding is half-away-from-zero via floor/ceil — matching
  * `functions.round` everywhere except astronomically unlikely FP
  * boundary ties, same caveat the composable path already carries.
  *
  * Returns NULL if either array is NULL or either norm is zero.
  * Arrays of different lengths use the common prefix.
  */
case class CosineScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_scaled"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineScaled =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val xi = CosineScaled.scale(x.getFloat(i))
      val yi = CosineScaled.scale(y.getFloat(i))
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = graft.functions.CosineScaled.scale($x.getFloat($i));
         |  long $yi = graft.functions.CosineScaled.scale($y.getFloat($i));
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if ($na == 0L || $nb == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (double) $dot / Math.sqrt((double) $na * (double) $nb);
         |}
       """.stripMargin
    })
}

object CosineScaled {
  /** float → scaled long, half-away-from-zero (matches functions.round
    * modulo FP boundary ties). Public + static-reachable for codegen. */
  def scale(f: Float): Long = {
    val v = f.toDouble * 1e6
    if (v >= 0) math.floor(v + 0.5d).toLong else math.ceil(v - 0.5d).toLong
  }

  /** Column-API wrapper. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineScaled(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_scaled"),
    new ExpressionInfo(classOf[CosineScaled].getName, "cosine_scaled"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cosine_scaled takes 2 arguments")
      CosineScaled(args(0), args(1))
    })

  /** Imperative registration (idempotent) for sessions built without the
    * extensions config. */
  def register(registry: FunctionRegistry): Unit = {
    val (id, info, builder) = registryEntry
    registry.registerFunction(id, info, builder)
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineScaled.registryEntry)
    ext.injectFunction(BoundedTopKAgg.registryEntry)
    ext.injectFunction(TopKEdgesAgg.registryEntry)
    ext.injectFunction(FoldAccents.registryEntry)
    ext.injectFunction(CmsSketch.mergeRegistryEntry)
    ext.injectFunction(CmsSketch.estimateRegistryEntry)
    ext.injectFunction(TokenRepStats.registryEntry)
    ext.injectOptimizerRule(_ => BandedLevenshteinRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
