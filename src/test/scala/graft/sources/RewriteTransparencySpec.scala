package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** OPTIMIZE-transparent streaming: a snapshot-scoped rewrite announces
 * its files with the replaced names attached (Entry.rewriteOf), and a
 * log-path streaming consumer that has delivered every replaced file
 * admits the rewritten files as seen-WITHOUT-delivery (sentinel length
 * in the batch log, so restarts replay the skip exactly). A consumer
 * without that history delivers normally — completeness beats dedup. */
class RewriteTransparencySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  private def writeBatch(dir: String, ids: Range): Unit =
    ids.toDF("id").select(col("id").cast("int").as("id"),
        (col("id") * 1.5).as("v"))
      .repartition(2)
      .write.format("scbf").mode("append").save(dir)

  private def startCollector(dir: String, ckpt: String,
      seen: mutable.ArrayBuffer[Seq[Int]], reconcileEvery: Int = 0) =
    spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", reconcileEvery.toString)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()

  test("an OPTIMIZE between triggers delivers nothing; later appends still flow") {
    val dir = Files.createTempDirectory("scbf-rw-transp").toString
    val ckpt = Files.createTempDirectory("scbf-rw-transp-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10), s"baseline delivery: $seen")
      // compact 2 files into 1 — pure rewrite, zero new rows
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"a rewrite must deliver NOTHING to a caught-up consumer: $seen")
      assert(ScbfDataSource.listings.get == 0,
        "the skip must ride the discovery log, not a listing")
      // fresh data after the rewrite flows exactly once
      writeBatch(dir, 10 until 15)
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 15), s"post-rewrite append: $seen")
    } finally q.stop()
  }

  test("the skip survives a restart AND reconcile listings") {
    val dir = Files.createTempDirectory("scbf-rw-restart").toString
    val ckpt = Files.createTempDirectory("scbf-rw-restart-ckpt").toString
    writeBatch(dir, 0 until 8)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q1 = startCollector(dir, ckpt, seen)
    try {
      q1.processAllAvailable()
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
      q1.processAllAvailable() // skip batch logged with sentinel lengths
    } finally q1.stop()
    assert(seen.flatten.sorted == (0 until 8))
    // restart with reconcileEvery=1: EVERY trigger is a full listing,
    // which must re-derive the same skip from the live delta's
    // rewrite markers instead of re-admitting the rewritten file
    val q2 = startCollector(dir, ckpt, seen, reconcileEvery = 1)
    try {
      q2.processAllAvailable()
      assert(seen.flatten.size == 8, s"restart re-delivered rewritten rows: $seen")
      writeBatch(dir, 8 until 12)
      q2.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 12), s"post-restart append: $seen")
    } finally q2.stop()
  }

  test("a FRESH consumer after the rewrite still gets the data, exactly once") {
    val dir = Files.createTempDirectory("scbf-rw-fresh").toString
    writeBatch(dir, 0 until 6)
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val ckpt = Files.createTempDirectory("scbf-rw-fresh-ckpt").toString
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      // empty seen set: rewriteOf ⊄ seen → the rewritten file is real
      // data to this consumer and must arrive exactly once
      assert(seen.flatten.sorted == (0 until 6), s"fresh consumer: $seen")
      q.processAllAvailable()
      assert(seen.flatten.size == 6, "no duplicates on later triggers")
    } finally q.stop()
  }

  test("a DELETE's replacement files are also invisible to a caught-up consumer") {
    val dir = Files.createTempDirectory("scbf-rw-del").toString
    val ckpt = Files.createTempDirectory("scbf-rw-del-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10))
      // DELETE rewrites the affected files through the append path with
      // rewriteOfNames — survivors are a SUBSET of delivered rows, and
      // an append-only stream cannot retract deletions anyway
      ScbfDelete.deleteWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)))
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"the delete's replacement files re-delivered rows: $seen")
      // the table itself reflects the delete for batch readers
      val left = spark.read.format("scbf").load(dir)
        .select("id").as[Int].collect().sorted
      assert(left.toSeq == (3 until 10), s"table after delete: ${left.toSeq}")
      writeBatch(dir, 10 until 12)
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 12), s"post-delete append: $seen")
    } finally q.stop()
  }

  test("UPDATE is stream-invisible too: the no-CDC contract, pinned") {
    // an append-only stream can express neither retraction nor
    // modification; re-delivering an UPDATE's rewritten files (what a
    // plain file stream would do) duplicates every unmodified row and
    // interleaves old/new values — strictly worse than the skip. The
    // contract: maintenance/DELETE/UPDATE are invisible to caught-up
    // streams; updated values reach batch readers and FRESH streams.
    val dir = Files.createTempDirectory("scbf-rw-upd").toString
    val ckpt = Files.createTempDirectory("scbf-rw-upd-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10))
      ScbfDelete.updateWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)),
        Map("v" -> lit(-1.0)))
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"the update's replacement files re-delivered rows: $seen")
      val updated = spark.read.format("scbf").load(dir)
        .filter(col("v") === -1.0).select("id").as[Int].collect().sorted
      assert(updated.toSeq == (0 until 3), s"batch view after update: ${updated.toSeq}")
    } finally q.stop()
  }

  test("rewriteOf entries round-trip the delta format and compaction") {
    val dir = Files.createTempDirectory("scbf-rw-fmt").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val table = new org.apache.hadoop.fs.Path(dir)
    ScbfDiscovery.append(table, conf, Seq(
      ScbfDiscovery.Entry("plain.scbf", 10L, 1L),
      ScbfDiscovery.Entry("rw.scbf", 20L, 2L, Seq("a.scbf", "b.scbf"))))
    val read = ScbfDiscovery.listDeltas(table, conf)
      .flatMap(n => ScbfDiscovery.readDelta(table, conf, n))
    assert(read.toSet == Set(
      ScbfDiscovery.Entry("plain.scbf", 10L, 1L),
      ScbfDiscovery.Entry("rw.scbf", 20L, 2L, Seq("a.scbf", "b.scbf"))),
      s"got $read")
  }
}
