package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall profile of one SparkEntry query: registers a listener
 * that records each job's submit→end wall time, task count and call
 * site, plus the GAPS between jobs (driver-side work: planning, log
 * replays, filesystem metadata, commit protocol). The job table is the
 * empirical view the optimization guide's §1 asks for when the UI is
 * off. Usage:
 *   Test/runMain graft.tools.ProfileQuery <name>[,name2,...] [sfDir] [iters]
 */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
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
    args.drop(3).filter(_.contains("=")).foreach { a =>
      val Array(k, v) = a.split("=", 2); spark.conf.set(k, v)
      println(s"[prof] conf $k=$v")
    }
    case class Job(id: Int, submitted: Long, var ended: Long = -1,
        var tasks: Int = 0, site: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val j = Job(js.jobId, System.nanoTime(),
          tasks = js.stageInfos.map(_.numTasks).sum,
          site = js.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(30)}#${si.numTasks}")
            .mkString(" "))
        jobs.put(js.jobId, j); order.add(j)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId); if (j != null) j.ended = System.nanoTime()
      }
    })
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm
    for (name <- names; i <- 1 to iters) {
      jobs.clear(); order.clear()
      graft.operators.Ops.stagedClear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener drain
      println(f"%n=== $name iter $i: total $total%.3f s ===")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.sortBy(_.submitted)
      var prevEnd = t0
      var jobSum = 0.0; var gapSum = 0.0
      js.foreach { j =>
        val gap = (j.submitted - prevEnd) / 1e9
        val dur = if (j.ended > 0) (j.ended - j.submitted) / 1e9 else -1.0
        if (dur >= 0) { jobSum += dur; gapSum += math.max(gap, 0) }
        println(f"  job ${j.id}%4d  gap ${gap * 1000}%7.0f ms  dur ${dur * 1000}%8.0f ms  tasks ${j.tasks}%4d  ${j.site.take(110)}")
        prevEnd = math.max(prevEnd, if (j.ended > 0) j.ended else j.submitted)
      }
      val tail = (t0 + (total * 1e9).toLong - prevEnd) / 1e9
      println(f"  [sum] jobs $jobSum%.3f s, inter-job gaps $gapSum%.3f s, tail ${math.max(tail, 0)}%.3f s, jobs n=${js.size}")
    }
    spark.stop()
  }
}
