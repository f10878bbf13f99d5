package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming micro-batch read of a growing SCBF directory: files
 * present at start are batch 1, files appearing later arrive in later
 * batches, nothing is read twice, and a restarted query resumes from
 * the checkpoint's file-batch log instead of re-reading everything. */
class ScbfStreamSourceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def writeBatch(dir: String, ids: Range): Unit =
    ids.toDF("id").withColumn("name", concat(lit("n"), col("id").cast("string")))
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType, nullable = false)))

  test("files appearing between triggers arrive exactly once, in later batches") {
    val dir = Files.createTempDirectory("scbf-stream").toString
    val ckpt = Files.createTempDirectory("scbf-stream-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[(Long, Seq[Int])]
    val q = spark.readStream.format("scbf").schema(schema).load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        seen.synchronized { seen += ((batchId, df.select("id").as[Int].collect().toSeq)) }
        ()
      }.start()
    try {
      q.processAllAvailable()
      writeBatch(dir, 10 until 25)
      q.processAllAvailable()
      writeBatch(dir, 25 until 30)
      q.processAllAvailable()
    } finally q.stop()
    val all = seen.flatMap(_._2).sorted
    assert(all == (0 until 30), s"got $seen")
    // the later files must NOT have been folded into the first batch
    assert(seen.head._2.toSet == (0 until 10).toSet, s"got $seen")
  }

  test("a restarted query resumes from the checkpoint log, not from scratch") {
    val dir = Files.createTempDirectory("scbf-stream-r").toString
    val ckpt = Files.createTempDirectory("scbf-stream-r-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    def run(): Unit = {
      val q = spark.readStream.format("scbf").schema(schema).load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(dir, 0 until 5)
    run()
    writeBatch(dir, 5 until 12)
    run() // second query instance, same checkpoint
    assert(seen.flatten.sorted == (0 until 12), s"got $seen")
    assert(seen.flatten.size == 12, s"duplicated rows across restart: $seen")
  }

  test("maxFilesPerTrigger drains a backlog over several bounded batches") {
    val dir = Files.createTempDirectory("scbf-stream-t").toString
    val ckpt = Files.createTempDirectory("scbf-stream-t-ckpt").toString
    (0 until 5).foreach(i => writeBatch(dir, i * 2 until i * 2 + 2)) // 5 files, 2 rows each
    val batches = mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("maxFilesPerTrigger", 2).load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.sum == 10, s"got $batches")
    assert(batches.forall(_ <= 4), s"a batch exceeded 2 files x 2 rows: $batches")
    assert(batches.count(_ > 0) >= 3, s"backlog not split across triggers: $batches")
  }

  test("restart-replay stays exact across a compaction boundary, and old logs purge") {
    val dir = Files.createTempDirectory("scbf-stream-c").toString
    val ckpt = Files.createTempDirectory("scbf-stream-c-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    // each range becomes its own micro-batch (write, then drain)
    def run(ranges: Seq[Range]): Unit = {
      val q = spark.readStream.format("scbf").schema(schema)
        .option("compactInterval", 2).load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try ranges.foreach { r => writeBatch(dir, r); q.processAllAvailable() }
      finally q.stop()
    }
    // batch 1 | restart | batches 2 (snapshot), 3 | restart | 4 (snapshot), 5:
    // the second restart's recovery rebuilds the seen set from the
    // batch-2 snapshot + the batch-3 delta, not from every log
    run(Seq(0 until 3))
    run(Seq(3 until 7, 7 until 9))
    run(Seq(9 until 11, 11 until 14))
    assert(seen.flatten.sorted == (0 until 14), s"got $seen")
    assert(seen.flatten.size == 14, s"duplicated rows across compaction: $seen")
    // retention: after the last commit the log dir must hold the latest
    // snapshot and only deltas after it — not every log ever written.
    // (Spark hands each source a per-source checkpoint subdirectory, so
    // find the log dir rather than assuming its depth.)
    val logDir = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString == "scbf-file-batches")
      .findFirst().orElseThrow(() =>
        new AssertionError(s"no scbf-file-batches dir under $ckpt")).toFile
    val names = logDir.list().toSeq.filterNot(_.startsWith("."))
    val compacts = names.filter(_.endsWith(".compact"))
    assert(compacts == Seq("4.compact"), s"log dir: $names")
    val deltas = names.filterNot(_.endsWith(".compact")).flatMap(_.toLongOption)
    assert(deltas.forall(_ > 4), s"stale deltas survived purge: $names")
  }

  test("streaming scan prunes columns like the batch scan") {
    val dir = Files.createTempDirectory("scbf-stream-p").toString
    val ckpt = Files.createTempDirectory("scbf-stream-p-ckpt").toString
    writeBatch(dir, 0 until 4)
    val sums = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("scbf").schema(schema).load(dir)
      .select("id") // only id: the name column's blocks must not be needed
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.schema.fieldNames.toSeq == Seq("id"))
        sums.synchronized { sums += df.as[Int].collect().map(_.toLong).sum }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(sums.sum == (0 until 4).sum)
  }
}
