package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-probe for isolating one stage of a query pipeline.
 * Not part of any protocol; edited freely during optimization rounds. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs rows = ${docs0.count()}")
    println(s"[probe] total tokens = " + docs0
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n")).head())
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = docs0.repartition(32, col("doc_id"))
      .withColumn("w", split(col("text"), " "))
      .withColumn("g", expr(
        """array_distinct(filter(transform(w, (x, i) ->
          |  IF(i <= size(w) - 2, concat(x, '_', element_at(w, i + 2)), NULL)),
          |  y -> y IS NOT NULL))""".stripMargin))
      .select(col("source"), col("doc_id"), col("g"))
    (1 to 2).foreach { i =>
      time(s"gram-build+explode+hash iter $i") {
        docs.select(col("source"), col("doc_id"), explode(col("g")).as("gs"))
          .select(col("source"), col("doc_id"), xxhash64(col("gs")).as("gram"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"checkpointed-g then explode iter $i") {
        val mat = docs.localCheckpoint()
        mat.select(col("source"), col("doc_id"), explode(col("g")).as("gs"))
          .select(col("source"), col("doc_id"), xxhash64(col("gs")).as("gram"))
          .write.format("noop").mode("overwrite").save()
        graft.operators.Ops.release(mat)
      }
      // hash tokens first: the lambda works on longs, gram = hash pair
      val docsH = docs0.repartition(32, col("doc_id"))
        .withColumn("w", expr("transform(split(text, ' '), t -> xxhash64(t))"))
        .withColumn("g", expr(
          """array_distinct(filter(transform(w, (x, i) ->
            |  IF(i <= size(w) - 2, xxhash64(x, element_at(w, i + 2)), NULL)),
            |  y -> y IS NOT NULL))""".stripMargin))
        .select(col("source"), col("doc_id"), col("g"))
      time(s"hash-first gram+explode iter $i") {
        docsH.select(col("source"), col("doc_id"), explode(col("g")).as("gram"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
