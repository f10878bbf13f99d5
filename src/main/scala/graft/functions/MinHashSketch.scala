package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * All-in-one minhash sketch aggregate: min over xxhash64(i, x) for
 * i ∈ [0, numHashes), returned as one array<bigint>.
 *
 * Why custom: the equivalent spelling as numHashes separate
 * `min(xxhash64(lit(i), col))` aggregates works, but each expression
 * re-hashes the input column and the generated HashAggregate carries
 * numHashes buffer slots — at 48 hashes the janino compile of that
 * operator dominates cold-start and every row pays 48 expression-tree
 * evaluations. As a TypedImperativeAggregate the buffer is one
 * long[numHashes], updated in a tight loop with the same XXH64
 * primitives Spark's xxhash64 uses — bit-identical results
 * (seed 42, hashInt(i) folded into hashLong(x), exactly the
 * HashExpression child-fold order for (lit(i): int, x: long)) — and
 * the merge is elementwise min, so map-side partial aggregation
 * applies as usual.
 *
 * Input must be LongType (hash the data to a long first — that is the
 * shape d2 uses anyway). Null inputs are ignored, like min().
 */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  /** The per-slot seed hashInt(i, 42) depends only on i — computed once
   * per operator instance, not per row (update is the hottest loop in
   * the engine). */
  @transient private lazy val seeds: Array[Long] = MinHashSketch.familySeeds(numHashes)

  // slot numHashes counts non-null inputs, so an all-null (or empty)
  // group evals to NULL like min() would — not a sentinel array that
  // two empty groups would share as a fake all-bands match
  override def createAggregationBuffer(): Array[Long] = {
    val buf = Array.fill(numHashes + 1)(Long.MaxValue)
    buf(numHashes) = 0L
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val s = seeds
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(x, s(i))
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
      buffer(numHashes) += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1(numHashes) += b2(numHashes)
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(numHashes) == 0L) null
    else new GenericArrayData(java.util.Arrays.copyOfRange(buffer, 0, numHashes))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((numHashes + 1) * 8).order(ByteOrder.LITTLE_ENDIAN)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(numHashes + 1)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects a bigint input (hash the value first), " +
        s"got ${child.dataType.simpleString}")
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinHashSketch].getName, "minhash_sketch")

  /** The minhash family's per-index seeds — ONE definition so batch
   * sketches and the streaming near-dup signatures (EventStreams)
   * stay signature-compatible. */
  def familySeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))
}
