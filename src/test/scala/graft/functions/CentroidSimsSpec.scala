package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CentroidSimsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(7)
  private val cents = Array.fill(5, dim)(rnd.nextGaussian())

  test("each slot is bit-identical to cosine_sim against that centroid") {
    val vecs = Seq.fill(40)(Array.fill(dim)(rnd.nextGaussian()))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "e")
    val got = df.select($"id", GraftFunctions.centroidSims($"e", cents).as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    val expected = df.select($"id",
        array(cents.map(c => GraftFunctions.cosineSim($"e", typedlit(c.toSeq))).toSeq: _*).as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got == expected)
  }

  test("float input upcasts to the same similarities as double input") {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val asFloat = Seq(Tuple1(v.map(_.toFloat))).toDF("e")
    val asDouble = Seq(Tuple1(v)).toDF("e")
    val a = asFloat.select(GraftFunctions.centroidSims(
      $"e".cast("array<double>"), cents)).as[Seq[Double]].head()
    val b = asFloat.select(GraftFunctions.centroidSims($"e", cents))
      .as[Seq[Double]].head()
    assert(a == b)
    assert(asDouble.select(GraftFunctions.centroidSims($"e", cents))
      .as[Seq[Double]].head().length == cents.length)
  }

  test("evaluates inside whole-stage codegen with no ScalaUDF in the plan") {
    val df = spark.range(4)
      .select(array((0 until dim).map(i => ($"id" + i).cast("double")): _*).as("e"))
      .select(GraftFunctions.centroidSims($"e", cents).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("*(1) Project [centroid_sims"), plan)
    assert(df.collect().length == 4)
  }

  test("zero-norm input yields 0.0 similarities, not nulls") {
    val df = Seq(Tuple1(Array.fill(dim)(0.0))).toDF("e")
    assert(df.select(GraftFunctions.centroidSims($"e", cents))
      .as[Seq[Double]].head() == Seq.fill(cents.length)(0.0))
  }

  test("null embedding yields null; wrong dimensionality throws") {
    val withNull = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS e")
    assert(withNull.select(GraftFunctions.centroidSims($"e", cents))
      .collect().head.isNullAt(0))
    val bad = Seq(Tuple1(Array.fill(dim + 1)(1.0))).toDF("e")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.centroidSims($"e", cents)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dim")))
  }
}
