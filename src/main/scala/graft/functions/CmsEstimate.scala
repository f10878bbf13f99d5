package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Point lookup into a serialized Count-Min sketch: the probe half of
 * the heavy-hitters story (q47). Spark's `count_min_sketch` AGGREGATE
 * builds the sketch (adding string values as their UTF-8 bytes —
 * CountMinSketchAgg's addBinary path), but no built-in function can
 * QUERY one — estimates would need a driver loop or a Scala UDF.
 * This expression carries the sketch as plan-attached model state
 * (the [[CentroidSims]] pattern: the model rides the expression, the
 * data never moves) and calls `estimateCount` per row through the
 * same byte path the aggregate used to add, so add/estimate hashing
 * cannot diverge.
 *
 * The sketch deserializes once per executor ([transient lazy]); the
 * serialized form is ~depth×width×8 bytes (≈112 KB at eps 0.001,
 * confidence 0.99) — model-sized, like the IVF centroids.
 */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  /** Instance method so both eval paths share the lazily-deserialized
   * sketch (codegen references the expression object itself). */
  def estimate(s: UTF8String): Long = sketch.estimateCount(s.getBytes)

  override def nullSafeEval(a: Any): Any = estimate(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.estimate($a);")
  }
}
