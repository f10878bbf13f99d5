package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeWrite {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val typed = s.read.option("header", true).csv("/tmp/huge.csv")
      .select(col("id").cast("int").as("id"), col("label"),
        col("score").cast("double").as("score"), col("name"))
      .repartition(32)
    typed.cache().count()
    time("scbf write from cached input (run 1)") {
      typed.write.format("scbf").mode("overwrite").save("/tmp/huge_dir_scbf")
    }
    time("scbf write from cached input (run 2)") {
      typed.write.format("scbf").mode("overwrite").save("/tmp/huge_dir_scbf")
    }
    time("parquet write from cached input (baseline)") {
      typed.write.mode("overwrite").parquet("/tmp/huge_dir_parquet")
    }
    s.stop()
  }
}
