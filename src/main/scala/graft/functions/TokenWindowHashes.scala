package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/**
 * Stride-1 window hashes of a token array — the d16/d17 span-dedup
 * map-side kernel as a native codegen expression. For each window
 * start i (`spanTokens` tokens), the key is Spark's
 * `xxhash64(xxhash64(tok_i), …, xxhash64(tok_{i+L−1}))`: each token
 * hashed once (XXH64 over its UTF-8 bytes, seed 42 — `xxhash64`'s
 * seed), then the window key folds the L token hashes through XXH64's
 * long-mix with seed chaining, exactly the multi-argument `xxhash64`
 * semantics. Bit-identical to the
 * `transform(sequence(…), i -> xxhash64(element_at(th, i+1), …))`
 * HOF chain it replaces.
 *
 * Why custom: that chain runs interpreted — two lambda traversals with
 * per-element boxing and an O(L) element_at fan-in per window, on the
 * most data-proportional stage the engine has (the stride-1 explode
 * feeds spanWinners' corpus-wide aggregate). One tight loop, token
 * bytes touched once, fused into whole-stage codegen — the
 * [[WinnowFingerprints]] rationale applied to the EXACT span pipeline.
 *
 * Null array → null; null tokens throw (the [[RollingHash]] contract).
 */
case class TokenWindowHashes(child: Expression, spanTokens: Int)
  extends UnaryExpression {

  require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)

  override def prettyName: String = "token_window_hashes"

  override def nullSafeEval(a: Any): Any =
    TokenWindowHashes.compute(a.asInstanceOf[ArrayData], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenWindowHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a, $spanTokens);")
  }
}

object TokenWindowHashes {

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TokenWindowHashes].getName, "token_window_hashes")


  private val Seed = 42L // xxhash64's fixed seed

  /** xxhash64(token) — the per-token half of the window-key
   * convention, shared with [[WinnowFingerprints]]'s xxhash64 family
   * so d22-under-xxhash64 fingerprints ARE a winnowed subset of d16's
   * window keys by construction. */
  def tokenHash(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)

  /** Window key at start `i` over the per-token hashes: seed-chained
   * long mixes, the multi-argument `xxhash64(th_i, …, th_{i+L−1})`
   * fold. */
  def windowKey(th: Array[Long], i: Int, spanTokens: Int): Long = {
    var h = Seed
    var k = 0
    while (k < spanTokens) {
      h = XXH64.hashLong(th(i + k), h)
      k += 1
    }
    h
  }

  def compute(arr: ArrayData, spanTokens: Int): ArrayData = {
    val n = arr.numElements()
    val nWin = n - spanTokens + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Long])
    // per-token hash, once — xxhash64(token)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"null token at index $i in token_window_hashes input")
      th(i) = tokenHash(arr.getUTF8String(i).getBytes)
      i += 1
    }
    val out = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      out(i) = windowKey(th, i, spanTokens)
      i += 1
    }
    new GenericArrayData(out)
  }
}
