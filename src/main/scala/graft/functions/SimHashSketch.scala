package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * All-in-one 64-bit SimHash aggregate over per-token hash halves
 * (hv_hi = bits 32-63, hv_lo = bits 0-31 — two 32-bit values so no
 * input ever leaves the signed-BIGINT range in any engine): per bit j,
 * sum ±1 by the bit's value across the group's tokens, then recombine
 * sign(sum) > 0 into one signed long (bit 63 contributes
 * Long.MinValue — see DedupQueries.SimhashSigsSql for the identical
 * oracle spelling).
 *
 * Why custom: the equivalent 64 separate `sum(when((hv >> j) & 1 …))`
 * aggregates work, but the generated HashAggregate carries 64 buffer
 * slots and 64 expression trees per row — the janino compile of that
 * operator dominated d3/d10's cold time, the same pathology
 * [[MinHashSketch]] fixed for d2's 48 min-slots. As a
 * TypedImperativeAggregate the buffer is one long[64] updated in a
 * tight bit-twiddling loop; the merge is elementwise addition, so
 * map-side partial aggregation applies as usual. Bit-identical to the
 * 64-aggregate spelling on non-null input (integer sums, same
 * recombination).
 *
 * Null handling DIFFERS from the spelled-out sums, deliberately: a row
 * with a null half is skipped entirely (the sum(when-otherwise(-1))
 * spelling counted it as -1 on every bit — an artifact, not a
 * semantic), and an all-null group evals to null. d3's md5-derived
 * hashes are never null, so the two spellings agree everywhere the
 * engine uses them.
 */
case class SimHashSketch(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val Bits = 64

  // slot Bits counts contributing rows, so an all-null group evals to
  // NULL rather than the all-zero-sums signature
  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val hi = left.eval(input)
    val lo = right.eval(input)
    if (hi != null && lo != null) {
      val h = hi.asInstanceOf[Long]
      val l = lo.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buffer(j) += (if (((l >> j) & 1L) == 1L) 1L else -1L)
        buffer(32 + j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      buffer(Bits) += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j <= Bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(Bits) == 0L) null
    else {
      var sig = 0L
      var j = 0
      while (j < Bits) {
        if (buffer(j) > 0L) sig |= (1L << j) // j = 63 sets the sign bit
        j += 1
      }
      sig
    }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((Bits + 1) * 8).order(ByteOrder.LITTLE_ENDIAN)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(Bits + 1)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sketch expects two bigint inputs (hi, lo hash halves), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def prettyName: String = "simhash_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSketch =
    copy(left = newLeft, right = newRight)
}

object SimHashSketch {
  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimHashSketch].getName, "simhash_sketch")
}
