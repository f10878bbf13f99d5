package graft.tools
import org.apache.spark.sql.SparkSession
/** Same-session interleaved A/B: run `name` alternating conf A/B per
 * iteration so box drift hits both variants equally. */
object ABQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val pairs = args(2).toInt
    val Array(k, va, vb) = args(3).split(":", 3) // key:valA:valB
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    def one(v: String): Double = {
      spark.conf.set(k, v)
      graft.operators.Ops.stagedClear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    one(va); one(vb) // warm both code paths outside measurement
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    (1 to pairs).foreach { i =>
      val ta = one(va); val tb = one(vb)
      as += ta; bs += tb
      println(f"[ab] pair $i: $k=$va ${ta}%.3f s | $k=$vb ${tb}%.3f s")
    }
    println(f"[ab] MIN  $k=$va ${as.min}%.3f s | $k=$vb ${bs.min}%.3f s")
    println(f"[ab] MEAN $k=$va ${as.sum / as.size}%.3f s | $k=$vb ${bs.sum / bs.size}%.3f s")
    spark.stop()
  }
}
