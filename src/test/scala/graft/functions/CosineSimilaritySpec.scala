package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CosineSimilaritySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def df = Seq(
    (Array(1.0, 0.0), Array(1.0, 0.0)),   // identical -> 1
    (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal -> 0
    (Array(1.0, 2.0), Array(2.0, 4.0)),   // parallel -> 1
    (Array(1.0, 0.0), Array(-1.0, 0.0))   // opposite -> -1
  ).toDF("a", "b")

  test("cosine_sim computes correct values through codegen") {
    val got = df.select(GraftFunctions.cosineSim($"a", $"b").as("sim"))
      .as[Double].collect().toSeq
    assert(got.map(v => math.round(v * 1e9) / 1e9) == Seq(1.0, 0.0, 1.0, -1.0))
  }

  test("matches the interpreted higher-order-function formulation bit-exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.limit(3).select($"vec_id".as("qid"), $"e".as("qe"))
    val pairs = emb.crossJoin(broadcast(q))
    val native = pairs.select(GraftFunctions.cosineSim($"qe", $"e").as("s"))
      .as[Double].collect().toSeq
    val hof = pairs.select(expr(
      """aggregate(zip_with(qe, e, (x, y) -> x * y), 0D, (a, x) -> a + x)
        | / (sqrt(aggregate(qe, 0D, (a, x) -> a + x * x))
        |    * sqrt(aggregate(e, 0D, (a, x) -> a + x * x)))""".stripMargin).as("s"))
      .as[Double].collect().toSeq
    assert(native == hof) // same accumulation order -> identical bits
  }

  test("two cosine_sim calls in one projection do not collide in codegen") {
    val r = df.select(
      GraftFunctions.cosineSim($"a", $"b").as("s1"),
      GraftFunctions.cosineSim($"b", $"a").as("s2"))
      .as[(Double, Double)].collect()
    assert(r.forall { case (x, y) => x == y })
  }

  test("nulls: mismatched lengths and zero vectors yield null") {
    val weird = Seq(
      (Array(1.0, 2.0), Array(1.0)),      // length mismatch
      (Array(0.0, 0.0), Array(1.0, 2.0))  // zero norm
    ).toDF("a", "b")
    val got = weird.select(GraftFunctions.cosineSim($"a", $"b").as("s"))
      .collect().map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
  }

  test("type mismatch is an analysis-time error") {
    val bad = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.cosineSim($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("cosine_sim") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("SQL registration on a running session via GraftFunctions.register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 0D), array(0.5D, 0D)) AS s").collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // the aggregate surface registers too, and matches the Column API
    val viaSql = spark.sql(
      "SELECT minhash_sketch(xxhash64(v), 4) AS s FROM VALUES ('a'), ('b') AS t(v)")
      .collect().head.getSeq[Long](0)
    val viaCol = {
      import spark.implicits._
      Seq("a", "b").toDF("v")
        .agg(GraftFunctions.minhashSketch(org.apache.spark.sql.functions.xxhash64($"v"), 4))
        .collect().head.getSeq[Long](0)
    }
    assert(viaSql == viaCol && viaSql.length == 4)
  }
}
