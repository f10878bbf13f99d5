package graft.tools
import org.apache.spark.sql.functions._
/** Dev-time: aggregate a 50k-row REFERENCE-written scbf via our
 * connector; output compared against duckdb over the source CSV. */
object BigInterop {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val df = s.read.format("scbf").load("/tmp/big.scbf")
    df.groupBy(col("label")).agg(count(lit(1)).as("cnt"),
        sum(col("score").cast("decimal(18,4)")).cast("double").as("sum_score"))
      .orderBy(col("label")).collect()
      .foreach(r => println(s"ROW|${r.getString(0)}|${r.getLong(1)}|${r.getDouble(2)}"))
    s.stop()
  }
}
