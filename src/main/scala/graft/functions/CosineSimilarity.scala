package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * cosine(a, b) over two double arrays as a native Catalyst expression
 * with code generation.
 *
 * Why custom: Spark's only built-in spelling is nested higher-order
 * functions (`aggregate(zip_with(...))`), and HigherOrderFunction
 * expressions are interpreted — three lambda-driven array traversals with
 * boxing per element. This is the ANN hot path (corpus_size × query_count
 * evaluations), so it gets the (b)-tier treatment from the design rules:
 * a scalar Expression with `doGenCode`, fused into whole-stage codegen as
 * one tight primitive loop. Semantics match the HOF formulation exactly
 * (same left-to-right double accumulation order).
 *
 * Returns null for null/mismatched-length/zero-norm inputs.
 */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"

  /** Shared by eval and the generated code (kept in one place so the
   * interpreted and codegen paths cannot drift). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineSimilarity.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // freshName: with non-nullable children nullSafeCodeGen emits no
    // enclosing block, so a fixed local name would collide when the
    // expression appears twice in one codegen scope
    val result = ctx.freshName("cosineResult")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $result = $cls.compute($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) $result).doubleValue();
         |}
       """.stripMargin
    })
  }
}

object CosineSimilarity {

  /** Null (boxed) when lengths differ or either norm is zero. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim")
}

/** Column-API front door for the graft native functions. */
object GraftFunctions {

  // Column <-> Expression bridging lives in sql-internal helpers
  // (org.apache.spark.sql.classic.ExpressionUtils is private[sql]); the
  // bytecode is public static methods, reached reflectively once.
  private lazy val exprUtils = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private lazy val toColumn =
    exprUtils.getMethod("column", classOf[Expression])
  private lazy val toExpression =
    exprUtils.getMethod("expression", classOf[Column])

  private def column(e: Expression): Column =
    toColumn.invoke(null, e).asInstanceOf[Column]
  private def expression(c: Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def hyperplaneBuckets(e: Column, planes: Array[Array[Array[Double]]]): Column =
    column(HyperplaneBuckets(expression(e), planes))

  def centroidSims(e: Column, cents: Array[Array[Double]]): Column =
    column(CentroidSims(expression(e), cents))

  def minhashSketch(x: Column, numHashes: Int): Column =
    column(MinHashSketch(expression(x), numHashes).toAggregateExpression())

  def rollingHash(tokens: Column): Column =
    column(RollingHash(expression(tokens)))

  def winnowFingerprints(tokens: Column, spanTokens: Int, winnowW: Int,
      hashAlgo: String = "md5"): Column =
    column(WinnowFingerprints(expression(tokens), spanTokens, winnowW, hashAlgo))

  def tokenWindowHashes(tokens: Column, spanTokens: Int): Column =
    column(TokenWindowHashes(expression(tokens), spanTokens))

  def cmsEstimate(c: Column, sketchBytes: Array[Byte]): Column =
    column(CmsEstimate(expression(c), sketchBytes))

  def simhashSketch(hi: Column, lo: Column): Column =
    column(SimHashSketch(expression(hi), expression(lo)).toAggregateExpression())

  /** Shared SQL builders — one definition used by both GraftExtensions
   * (config-time injection) and register() (runtime registration), so
   * the two SQL surfaces cannot drift. */
  private[functions] val sqlBuilders: Seq[
      (String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", CosineSimilarity.info, { args: Seq[Expression] =>
      require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
      CosineSimilarity(args.head, args(1))
    }),
    ("minhash_sketch", MinHashSketch.info, { args: Seq[Expression] =>
      require(args.length == 2,
        s"minhash_sketch expects 2 arguments (value, numHashes), got ${args.length}")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sketch numHashes must be an integer literal, got $other")
      }
      // raw AggregateFunction, NOT pre-wrapped in toAggregateExpression:
      // the analyzer only attaches FILTER (WHERE ...) / DISTINCT when it
      // does the wrapping itself
      MinHashSketch(args.head, n)
    }),
    ("simhash_sketch", SimHashSketch.info, { args: Seq[Expression] =>
      require(args.length == 2,
        s"simhash_sketch expects 2 arguments (hi, lo), got ${args.length}")
      SimHashSketch(args.head, args(1)) // raw aggregate, as minhash_sketch
    }),
    ("winnow_fingerprints", WinnowFingerprints.info, { args: Seq[Expression] =>
      require(args.length == 3 || args.length == 4,
        s"winnow_fingerprints expects 3 or 4 arguments " +
          s"(tokens, spanTokens, winnowW[, hashAlgo]), got ${args.length}")
      val algo = if (args.length == 4) strLit(args(3), "hashAlgo") else "md5"
      WinnowFingerprints(args.head, intLit(args(1), "spanTokens"),
        intLit(args(2), "winnowW"), algo)
    }),
    ("token_window_hashes", TokenWindowHashes.info, { args: Seq[Expression] =>
      require(args.length == 2,
        s"token_window_hashes expects 2 arguments (tokens, spanTokens), got ${args.length}")
      TokenWindowHashes(args.head, intLit(args(1), "spanTokens"))
    }))

  private def intLit(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def strLit(e: Expression, name: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  /** Register graft's SQL functions on an ALREADY-RUNNING session (a
   * session someone else built, where setting spark.sql.extensions is no
   * longer possible — e.g. a notebook or a driver-owned session).
   * spark-submit users should prefer the GraftExtensions config. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sessionState = spark.getClass.getMethod("sessionState").invoke(spark)
    val registry = sessionState.getClass.getMethod("functionRegistry").invoke(sessionState)
    val m = registry.getClass.getMethods.find { m =>
      m.getName == "registerFunction" && m.getParameterCount == 3 &&
        m.getParameterTypes()(0) == classOf[org.apache.spark.sql.catalyst.FunctionIdentifier] &&
        m.getParameterTypes()(1) == classOf[ExpressionInfo] &&
        m.getParameterTypes()(2).isAssignableFrom(classOf[Seq[Expression] => Expression])
    }.getOrElse(throw new IllegalStateException("FunctionRegistry.registerFunction not found"))
    sqlBuilders.foreach { case (name, info, builder) =>
      m.invoke(registry,
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
    }
  }
}
