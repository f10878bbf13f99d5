package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HyperplaneBucketsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(42)
  private val planes = Array.fill(2, 4, dim)(rnd.nextGaussian())

  /** Reference semantics, straight port of the UDF this expression
   * replaced: sign bit per plane, key = table<<32 | bits. */
  private def reference(e: Seq[Double]): Seq[Long] =
    planes.indices.map { t =>
      var key = 0L
      for (b <- planes(t).indices) {
        val dot = planes(t)(b).zip(e).map { case (p, x) => p * x }.sum
        if (dot > 0) key |= (1L << b)
      }
      t.toLong << 32 | key
    }.toSeq

  test("expression matches the reference semantics on random float vectors") {
    val vecs = Seq.fill(50)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "e")
    val got = df.select($"id",
        GraftFunctions.hyperplaneBuckets($"e", planes).as("b"))
      .as[(Int, Seq[Long])].collect().toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == reference(v.map(_.toDouble).toSeq), s"vec $i")
    }
  }

  test("double input produces the same buckets as float input upcast") {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val df = Seq(Tuple1(v)).toDF("e")
    val got = df.select(GraftFunctions.hyperplaneBuckets($"e", planes))
      .as[Seq[Long]].head()
    assert(got == reference(v.toSeq))
  }

  test("evaluates inside whole-stage codegen with no ScalaUDF in the plan") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // LocalRelation projection driver-side and leave no codegen to assert
    val df = spark.range(4)
      .select(array((0 until dim).map(i => ($"id" + i).cast("float")): _*).as("e"))
      .select(GraftFunctions.hyperplaneBuckets($"e", planes).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // the "*(n)" prefix is how executedPlan.toString marks a
    // WholeStageCodegen span containing the projection
    assert(plan.contains("*(1) Project [hyperplane_buckets"), plan)
    assert(df.collect().length == 4)
  }

  test("null embedding yields null; wrong dimensionality throws") {
    val withNull = spark.sql(s"SELECT CAST(NULL AS ARRAY<FLOAT>) AS e")
    assert(withNull.select(GraftFunctions.hyperplaneBuckets($"e", planes))
      .collect().head.isNullAt(0))
    val bad = Seq(Tuple1(Array.fill(dim + 1)(1.0f))).toDF("e")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.hyperplaneBuckets($"e", planes)).collect()
    }
    assert(e.getMessage.contains("dim") ||
      e.getCause != null && e.getCause.getMessage.contains("dim"))
  }

  test("a null ELEMENT is a loud data error, not a silent 0.0") {
    val lits = (0 until dim).map(i => if (i == 3) "NULL" else s"CAST($i AS FLOAT)")
    val withNullElem = spark.sql(
      s"SELECT ARRAY(${lits.mkString(", ")}) AS e")
    val e = intercept[Exception] {
      withNullElem.select(GraftFunctions.hyperplaneBuckets($"e", planes)).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: all(t.getCause)
    assert(all(e).exists(m => m != null && m.contains("null element")), e.toString)
  }
}
