package graft.tools

import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("q1_pricing_summary", "q5_multi_join", "q21_asof_join", "t3_token_count", "d1_dedup_exact")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val broadcasts = "BroadcastHashJoin|BroadcastExchange".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val scans = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
      // executedPlan renders codegen stages as "*(n)" markers
      val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).map(identity).toSet.size
      println(s"== $q: broadcast=$broadcasts smj=$smj pushedFilterScans=$scans codegenSpans=$wsc")
      plan.split("\n").filter(l => l.contains("FileScan") || l.contains("ReadSchema")).take(4).foreach(l => println("   " + l.trim.take(160)))
    }
    spark.stop()
  }
}
