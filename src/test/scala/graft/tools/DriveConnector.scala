package graft.tools
import org.apache.spark.sql.functions._
/** Dev-time drive: real testdata parquet -> scbf -> pruned read. */
object DriveConnector {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.session
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"))
    li.coalesce(1).write.format("scbf").mode("overwrite").save("/tmp/li_scbf")
    val back = spark.read.format("scbf").load("/tmp/li_scbf")
    val agg = back.groupBy("l_returnflag").agg(
      count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
    agg.orderBy("l_returnflag").show()
    println("PLAN:")
    back.select("l_returnflag", "l_quantity").explain("formatted")
    spark.stop()
  }
}
