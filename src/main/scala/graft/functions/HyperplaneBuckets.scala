package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Random-hyperplane LSH bucket keys for one embedding, as a native
 * Catalyst expression with code generation: for each of the supplied
 * hyperplane tables, the sign bits of plane·embedding form a bucket id,
 * returned as `table_index << 32 | sign_bits`.
 *
 * Why custom: this sits on the scale-path ANN hot path (one evaluation
 * per corpus row), and the Scala-UDF spelling it replaces deserialized
 * the embedding into a boxed Seq per row. As an Expression the inner
 * loop reads primitives straight out of the columnar ArrayData inside
 * whole-stage codegen — same (b)-tier rationale as [[CosineSimilarity]].
 *
 * The planes are carried as a plan-level reference object (serialized
 * once with the plan, not per row); they are constructor data, not a
 * child expression. Accepts array<float> or array<double> input. Null
 * input → null; an embedding whose length differs from the planes'
 * dimensionality is a data error and throws.
 */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.nonEmpty),
    "hyperplane_buckets needs at least one table with at least one plane")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** Shared by eval and the generated code (one implementation, so the
   * interpreted and codegen paths cannot drift). */
  override def nullSafeEval(a: Any): Any =
    HyperplaneBuckets.compute(planes, a.asInstanceOf[ArrayData], isFloat,
      mayHaveNullElements)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HyperplaneBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($planesRef, $a, $isFloat, $mayHaveNullElements);")
  }
}

object HyperplaneBuckets {

  def compute(planes: Array[Array[Array[Double]]], e: ArrayData,
      isFloat: Boolean, mayHaveNulls: Boolean): ArrayData = {
    val dim = planes(0)(0).length
    require(e.numElements() == dim,
      s"embedding dim ${e.numElements()} != expected $dim")
    // null elements are a data error, not a zero: ArrayData.getFloat on
    // a null slot would silently read 0.0 and assign plausible-but-wrong
    // buckets (the Scala UDF this replaced failed loudly — keep that).
    // Skipped entirely when the schema says containsNull=false: this is
    // the per-corpus-row hot path.
    if (mayHaveNulls) {
      var j = 0
      while (j < dim) {
        if (e.isNullAt(j))
          throw new IllegalArgumentException(s"null element at index $j in embedding")
        j += 1
      }
    }
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = 0L
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        var dot = 0.0
        var i = 0
        if (isFloat) {
          while (i < dim) { dot += plane(i) * e.getFloat(i); i += 1 }
        } else {
          while (i < dim) { dot += plane(i) * e.getDouble(i); i += 1 }
        }
        if (dot > 0) key |= (1L << b)
        b += 1
      }
      out(t) = t.toLong << 32 | key
      t += 1
    }
    new GenericArrayData(out)
  }
}
