package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * d22's fused map-side kernel as a native Catalyst expression: window
 * hashing + winnowed fingerprint selection over a token array, in one
 * codegen'd loop.
 *
 * Two hash families, selected by `hashAlgo` (the `graft.span.hash`
 * knob):
 *
 *  - `md5` (default, oracle parity): the window hash is the first 60
 *    bits of md5 over the space-joined window — exactly
 *    `CAST(conv(substr(md5(concat_ws(' ', slice(w, i+1, L))), 1, 15), 16, 10)
 *    AS BIGINT)`, the cross-engine value convention the DuckDB oracle
 *    replicates (the big-endian first 8 digest bytes >>> 4). Winnow
 *    SELECTION depends on hash VALUES, so the oracle can only
 *    replicate it under this family.
 *  - `xxhash64` (production): the window hash is
 *    [[TokenWindowHashes]]' window key — each token hashed once
 *    (XXH64, seed 42), windows folded through seed-chained long
 *    mixes, the multi-argument `xxhash64` semantics. One long-mix per
 *    token instead of a cryptographic digest per window: at 100 TB
 *    the md5 digest IS the dominant map-side cost of the pass, and
 *    the winnowing theorem (density 2/(W+1), exactness for spans
 *    ≥ L+W−1) is hash-agnostic, so the production family keeps every
 *    guarantee while cutting the kernel to arithmetic. Fingerprint
 *    hashes under this family equal d16's window keys by
 *    construction (shared [[TokenWindowHashes.windowKey]]).
 *
 * Winnowing (Schleimer et al.) then selects, for every run of
 * `winnowW` consecutive window hashes (a single truncated run when
 * there are fewer), the position of the minimum hash (leftmost on
 * ties — SQL's array_position rule), deduplicated. Selection is a
 * monotonic-deque sliding-window minimum — O(nWin) total, not
 * O(nWin×W): W is user-settable (`graft.winnow.window`) and
 * Lee-et-al-style span minimums use W≈43–50, where a per-position
 * rescan pays ~50× in the kernel's hottest loop. Strict-greater
 * pops preserve the leftmost-on-ties rule (an equal earlier hash is
 * never evicted by an equal later one). Returns
 * array<struct<idx:int, h:bigint>> of the selected fingerprints.
 *
 * Why custom: the HOF spelling runs interpreted — per window it builds
 * a slice array, a ~50-byte concat string, a 32-char md5 hex string
 * and a conv() base-16 parse, then the selection pass re-slices the
 * hash array twice per position. This loop digests straight from the
 * token bytes (no window string, no hex), selects in place, and fuses
 * into whole-stage codegen — the (b)-tier rationale of [[RollingHash]]
 * applied to d22's dominant map-side cost.
 *
 * Null array → null; null tokens throw (the [[RollingHash]] contract:
 * `split` can't produce them, so one means corrupted input).
 */
case class WinnowFingerprints(child: Expression, spanTokens: Int, winnowW: Int,
    hashAlgo: String = "md5")
  extends UnaryExpression {

  require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
  require(winnowW >= 1, s"winnowW must be >= 1, got $winnowW")
  require(hashAlgo == "md5" || hashAlgo == "xxhash64",
    s"hashAlgo must be md5 or xxhash64, got $hashAlgo")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.compute(a.asInstanceOf[ArrayData], spanTokens, winnowW, hashAlgo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      a => s"""${ev.value} = $cls.compute($a, $spanTokens, $winnowW, "$hashAlgo");""")
  }
}

object WinnowFingerprints {

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[WinnowFingerprints].getName, "winnow_fingerprints")


  private val Space = Array(' '.toByte)

  // MessageDigest is stateful — one per thread, reset per window
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Stride-1 window hashes over token byte arrays, per family. Shared
   * with the streaming twin ([[graft.streaming.EventStreams]]'
   * winnowedSpanDedup) so batch and stream select identical
   * positions under either knob value. */
  def hashWindows(toks: Array[Array[Byte]], spanTokens: Int,
      hashAlgo: String): Array[Long] = {
    val nWin = toks.length - spanTokens + 1
    val th = new Array[Long](nWin)
    if (hashAlgo == "md5") {
      val digest = md5.get()
      var i = 0
      while (i < nWin) {
        digest.reset()
        var k = 0
        while (k < spanTokens) {
          if (k > 0) digest.update(Space)
          digest.update(toks(i + k))
          k += 1
        }
        val d = digest.digest()
        // first 15 hex digits of the md5 = big-endian first 8 bytes >>> 4
        th(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        i += 1
      }
    } else {
      // xxhash64 family: tokens hashed once, windows folded — the
      // d16 window-key convention, shared code so the values agree
      val tks = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        tks(i) = TokenWindowHashes.tokenHash(toks(i))
        i += 1
      }
      i = 0
      while (i < nWin) {
        th(i) = TokenWindowHashes.windowKey(tks, i, spanTokens)
        i += 1
      }
    }
    th
  }

  /** Winnow selection over the window-hash array: for every run of
   * `winnowW` consecutive positions, mark the leftmost argmin.
   * Monotonic deque — each position is pushed and popped at most
   * once, O(nWin) total. The deque holds candidate indices with
   * strictly increasing hash values; a new position evicts only
   * STRICTLY greater tails, so among equal minima the earliest index
   * stays at the front — the leftmost-on-ties (array_position)
   * rule. */
  def winnowSelect(th: Array[Long], winnowW: Int): Array[Boolean] = {
    val nWin = th.length
    val selected = new Array[Boolean](nWin)
    if (nWin == 0) return selected
    val deque = new Array[Int](nWin)
    var head = 0
    var tail = 0 // live candidates are deque[head, tail)
    val lastStart = math.max(nWin - winnowW, 0)
    var next = 0 // first position not yet pushed
    var j = 0
    while (j <= lastStart) {
      val end = math.min(j + winnowW, nWin)
      while (next < end) {
        while (tail > head && th(deque(tail - 1)) > th(next)) tail -= 1
        deque(tail) = next
        tail += 1
        next += 1
      }
      while (deque(head) < j) head += 1
      selected(deque(head)) = true
      j += 1
    }
    selected
  }

  def compute(arr: ArrayData, spanTokens: Int, winnowW: Int,
      hashAlgo: String): ArrayData = {
    val n = arr.numElements()
    val nWin = n - spanTokens + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    // token bytes fetched once; each window digests L token slices +
    // L−1 separators straight into the digest (no window string)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"null token at index $i in winnow_fingerprints input")
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val th = hashWindows(toks, spanTokens, hashAlgo)
    val selected = winnowSelect(th, winnowW)
    val out = List.newBuilder[Any]
    i = 0
    while (i < nWin) {
      if (selected(i))
        out += (new GenericInternalRow(Array[Any](i, th(i))): InternalRow)
      i += 1
    }
    new GenericArrayData(out.result().toArray)
  }
}
