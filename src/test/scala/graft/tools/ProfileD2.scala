package graft.tools
import org.apache.spark.sql.functions._
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-20s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(docs.select((col("doc_id")+100000).as("doc_id"),
      regexp_replace(col("text"), "value ", "").as("text")))
    val sh = corpus.withColumn("w", split(col("text"), " "))
      .withColumn("s", expr("""array_distinct(filter(transform(w, (x, i) ->
        IF(i <= size(w) - 3, concat(x, '_', element_at(w, i + 2), '_', element_at(w, i + 3)), NULL)),
        y -> y IS NOT NULL))"""))
      .select(col("doc_id"), col("s")).filter(size(col("s")) > 0).cache()
    time("sh materialize")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("s")).as("x"))
    val mhAggs = (0 until 48).map(i => min(xxhash64(lit(i), col("x"))).as(s"mh$i"))
    val mh = ex.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*).cache()
    time("minhash")(mh.count())
    val bands = mh.select(col("doc_id"), posexplode(array(
      (0 until 24).map(j => concat_ws(":", col(s"mh${2*j}"), col(s"mh${2*j+1}"))): _*
    )).as(Seq("band_idx", "band_key"))).cache()
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
      col("x.band_idx") === col("y.band_idx") && col("x.band_key") === col("y.band_key") &&
      col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct().cache()
    time("cand join")(println("cands: " + cand.count()))
    val ver = cand.join(sh.select(col("doc_id"), col("s").as("sa")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("s").as("sb")), col("doc_b") === col("doc_id"))
      .select(col("doc_a"), col("doc_b"), size(array_intersect(col("sa"), col("sb"))).as("i"),
        (size(col("sa"))+size(col("sb"))-size(array_intersect(col("sa"), col("sb")))).as("u"))
      .filter(col("i")*10 >= col("u")*6)
    time("verify")(println("pairs: " + ver.count()))
    s.stop()
  }
}
