package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
object StreamSinkInterop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // driver entry smoke
    println("entry rows=" + graft.SparkEntry.entry(spark).count())
    val input = MemoryStream[(Int, String, Double)]
    val q = input.toDF().toDF("id", "name", "score")
      .writeStream.format("scbf")
      .option("checkpointLocation", "/tmp/ssi_ckpt").start("/tmp/ssi_out")
    input.addData((1, "alpha", 1.5), (2, "beta", 2.5))
    q.processAllAvailable(); q.stop()
    println("files=" + new java.io.File("/tmp/ssi_out").list().mkString(","))
    spark.stop()
  }
}
