package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Polynomial rolling hash of a token array, as a native Catalyst
 * expression with code generation:
 *
 *   h = fold over tokens of (h · 1000003 + md5_32(token)) mod (2³¹ − 1)
 *
 * where md5_32 is the first 4 md5 bytes of the token's UTF-8 encoding
 * read as an unsigned big-endian 32-bit value — exactly
 * `conv(substr(md5(t), 1, 8), 16, 10)`. Bit-identical to the
 * `aggregate(transform(w, …md5…), 0, (a, x) -> (a·1000003 + x) % p)`
 * HOF chain it replaces (same left-to-right fold; no intermediate value
 * exceeds 2⁵¹, so the long arithmetic never overflows).
 *
 * Why custom: t4 evaluates this once per document over every token, and
 * Spark's HigherOrderFunction expressions (`aggregate`, `transform`) run
 * interpreted — two lambda-driven traversals with per-element boxing, on
 * the only non-codegen hot path TextQueries had left. Same (b)-tier
 * rationale as [[CosineSimilarity]]: one tight loop fused into
 * whole-stage codegen.
 *
 * Null array → null. Null tokens are a data error and throw (the HOF
 * spelling silently nulled the whole hash; `split` can't produce null
 * elements, so reaching one means corrupted input — fail loudly, as
 * [[HyperplaneBuckets]] does).
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"

  /** Shared by eval and the generated code (one implementation, so the
   * interpreted and codegen paths cannot drift). */
  override def nullSafeEval(a: Any): Any =
    RollingHash.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }
}

object RollingHash {

  private val Mult = 1000003L
  private val Mod = 2147483647L // 2^31 - 1

  // MessageDigest is stateful — one per thread, reset per token
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    val digest = md5.get()
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"null token at index $i in rolling_hash input")
      digest.reset()
      val d = digest.digest(arr.getUTF8String(i).getBytes)
      val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h = (h * Mult + hv) % Mod
      i += 1
    }
    h
  }
}
