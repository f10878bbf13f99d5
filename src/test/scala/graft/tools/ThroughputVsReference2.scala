package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** The many-files variant of [[ThroughputVsReference]]: the layout every
 * real dataset uses (32 part files, parallel deflate on both write and
 * read). args(0) = input csv (default /tmp/huge.csv). */
object ThroughputVsReference2 {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse("/tmp/huge.csv")
    val outDir = csv + ".dir.scbf"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet("/root/testdata/sf0.001/nation.parquet").count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val raw = s.read.option("header", true).csv(csv)
    time("ours: csv -> scbf dir (32 part files, parallel deflate)") {
      raw.select(col("id").cast("int").as("id"), col("label"),
          col("score").cast("double").as("score"), col("name"))
        .repartition(32)
        .write.format("scbf").mode("overwrite").save(outDir)
    }
    time("ours: pruned 1-column read over 32-file layout") {
      s.read.format("scbf").load(outDir)
        .select(col("score")).write.format("noop").mode("overwrite").save()
    }
    time("ours: full scan over 32-file layout") {
      s.read.format("scbf").load(outDir)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
