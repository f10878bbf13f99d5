package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ThroughputVsReference2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet("/root/testdata/sf0.001/nation.parquet").count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val raw = s.read.option("header", true).csv("/tmp/huge.csv")
    time("ours: csv -> scbf dir (32 part files, parallel deflate)") {
      raw.select(col("id").cast("int").as("id"), col("label"),
          col("score").cast("double").as("score"), col("name"))
        .repartition(32)
        .write.format("scbf").mode("overwrite").save("/tmp/huge_dir_scbf")
    }
    time("ours: pruned 1-column aggregate over 32-file layout") {
      s.read.format("scbf").load("/tmp/huge_dir_scbf")
        .agg(sum(col("score").cast("decimal(18,4)"))).collect()
    }
    time("ours: full scan over 32-file layout") {
      s.read.format("scbf").load("/tmp/huge_dir_scbf")
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
