package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Cosine similarity of one embedding against a fixed centroid matrix,
 * returned as array<double> (one similarity per centroid, in centroid
 * order), as a native Catalyst expression with code generation.
 *
 * Why custom: IVF assignment (d11) evaluates every corpus row against
 * all kCells centroids, three times (two Lloyd's iterations + the final
 * assignment). Spelled as kCells separate cosine_sim calls against
 * kCells array literals plus a greatest + kCells-branch CASE argmax,
 * each pass generates (and JIT-compiles) enormous per-stage code with
 * the centroid arrays inlined as constants — measured at ~10 s of the
 * bench largely in codegen, and at risk of falling out of whole-stage
 * codegen on the 64 KB method limit as kCells grows. Here the matrix
 * rides along as ONE plan-level reference object (same pattern as
 * [[HyperplaneBuckets]]) and the inner loop reads primitives straight
 * out of the columnar ArrayData.
 *
 * Per-element arithmetic matches [[CosineSimilarity]].compute exactly
 * (same accumulation order, same dot/(sqrt·sqrt) form), so each slot
 * is bit-identical to cosine_sim(e, lit(centroid)) — except that a
 * zero-norm input yields 0.0 similarities rather than null, keeping
 * the result array null-element-free for array_max/array_position.
 * Null input → null; a dimensionality mismatch throws (data error).
 */
case class CentroidSims(child: Expression, cents: Array[Array[Double]])
  extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "centroid_sims needs a non-empty, rectangular centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_sims expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): CentroidSims =
    copy(child = newChild)

  override def prettyName: String = "centroid_sims"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** Per-centroid squared norms, hoisted out of the per-row loop (the
   * matrix is constant per expression instance; recomputing them per
   * row cost ~1/3 of the inner-loop FLOPs). Accumulated in the same
   * element order as the loop they replace, so results stay
   * bit-identical to cosine_sim. */
  @transient private lazy val centNorms: Array[Double] =
    cents.map { ct =>
      var nc = 0.0
      var k = 0
      while (k < ct.length) { nc += ct(k) * ct(k); k += 1 }
      nc
    }

  /** Shared by eval and the generated code (one implementation, so the
   * interpreted and codegen paths cannot drift). */
  override def nullSafeEval(a: Any): Any =
    CentroidSims.compute(cents, centNorms, a.asInstanceOf[ArrayData], isFloat,
      mayHaveNullElements)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CentroidSims.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($centsRef, $normsRef, $a, $isFloat, $mayHaveNullElements);")
  }
}

object CentroidSims {

  def compute(cents: Array[Array[Double]], centNorms: Array[Double], e: ArrayData,
      isFloat: Boolean, mayHaveNulls: Boolean): ArrayData = {
    val dim = cents(0).length
    require(e.numElements() == dim,
      s"embedding dim ${e.numElements()} != expected $dim")
    // null elements are a data error, not a zero (see HyperplaneBuckets)
    if (mayHaveNulls) {
      var j = 0
      while (j < dim) {
        if (e.isNullAt(j))
          throw new IllegalArgumentException(s"null element at index $j in embedding")
        j += 1
      }
    }
    var ne = 0.0
    var i = 0
    if (isFloat) {
      while (i < dim) { val v = e.getFloat(i).toDouble; ne += v * v; i += 1 }
    } else {
      while (i < dim) { val v = e.getDouble(i); ne += v * v; i += 1 }
    }
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val nc = centNorms(c)
      var dot = 0.0
      var k = 0
      if (isFloat) {
        while (k < dim) { dot += e.getFloat(k).toDouble * ct(k); k += 1 }
      } else {
        while (k < dim) { dot += e.getDouble(k) * ct(k); k += 1 }
      }
      out(c) = if (ne == 0.0 || nc == 0.0) 0.0
        else dot / (math.sqrt(ne) * math.sqrt(nc))
      c += 1
    }
    new GenericArrayData(out)
  }
}
