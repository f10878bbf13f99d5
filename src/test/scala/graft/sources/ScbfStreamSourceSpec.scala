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

  test("maxFileAge skips stale files and evicts them from the seen snapshot") {
    val dir = Files.createTempDirectory("scbf-stream-age").toString
    val ckpt = Files.createTempDirectory("scbf-stream-age-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    def run(): Unit = {
      val q = spark.readStream.format("scbf").schema(schema)
        .option("maxFileAge", "1h").option("compactInterval", 1).load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // age is relative to the NEWEST listed file, so "aging out" batch 1
    // means moving later batches' mtimes forward, not rewinding batch
    // 1's (admission stores the mtime it observed; rewinding a published
    // file would violate the immutability contract anyway)
    def writeBatchAt(ids: Range, mtime: Long): Unit = {
      val before = new java.io.File(dir).list().toSet
      writeBatch(dir, ids)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".scbf") && !before(f.getName))
        .foreach(f => assert(f.setLastModified(mtime)))
    }
    val t0 = System.currentTimeMillis()
    // batch 1 at t0
    writeBatchAt(0 until 3, t0)
    run()
    // batch 2 stamped t0+2h: horizon moves to t0+1h, so batch 1's
    // entries age out of the snapshot and its files out of admission —
    // but its rows must not be re-read OR lost
    writeBatchAt(3 until 5, t0 + 2 * 3600 * 1000L)
    run()
    writeBatchAt(5 until 7, t0 + 2 * 3600 * 1000L + 60000L)
    run()
    assert(seen.flatten.sorted == (0 until 7), s"got $seen")
    assert(seen.flatten.size == 7, s"duplicated or re-admitted rows: $seen")
    // retention rule half 1: an aged-out path STILL IN THE LISTING keeps
    // its seen entry — so touching its mtime past the horizon (the
    // FileStreamSource duplicate hazard) cannot get it re-admitted
    val batch1Files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".scbf") && f.lastModified() <= t0)
    assert(batch1Files.nonEmpty, "test setup: no aged files on disk")
    val batch1Names = batch1Files.map(_.getName).toSeq
    batch1Files.foreach(f =>
      assert(f.setLastModified(t0 + 2 * 3600 * 1000L + 90000L)))
    run()
    assert(seen.flatten.size == 7,
      s"touched-mtime known file was re-admitted as fresh: $seen")
    // retention rule half 2: once the aged path is DELISTED too, it
    // leaves the snapshot (its entry keeps the ADMISSION-time mtime t0,
    // far below the horizon — only listing membership was retaining it;
    // delete the files and trigger a fresh compact)
    batch1Files.foreach(f => assert(f.delete()))
    writeBatchAt(7 until 8, t0 + 2 * 3600 * 1000L + 120000L)
    run()
    assert(seen.flatten.sorted == (0 until 8), s"got $seen")
    val logDir = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString == "scbf-file-batches")
      .findFirst().orElseThrow(() =>
        new AssertionError(s"no scbf-file-batches dir under $ckpt")).toFile
    val compacts = logDir.list().toSeq.filterNot(_.startsWith("."))
      .filter(_.endsWith(".compact")).flatMap(n =>
        n.stripSuffix(".compact").toLongOption.map(_ -> n))
    val latest = compacts.maxBy(_._1)._2
    val snapshot = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(logDir.toString, latest)))
    batch1Names.foreach { n =>
      assert(!snapshot.contains(n),
        s"aged-and-delisted path $n still in snapshot $latest")
    }
  }

  test("restart at EVERY batch position stays exactly-once through compaction") {
    // property-style sweep: 6 batches at compactInterval 2 with a query
    // restart between every pair of batches — every possible recovery
    // point (before/at/after a snapshot, purge boundaries) must replay
    // to exactly-once
    val dir = Files.createTempDirectory("scbf-stream-rs").toString
    val ckpt = Files.createTempDirectory("scbf-stream-rs-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    (0 until 6).foreach { b =>
      writeBatch(dir, b * 4 until (b + 1) * 4)
      val q = spark.readStream.format("scbf").schema(schema)
        .option("compactInterval", 2).load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop() // restart every batch
    }
    assert(seen.flatten.sorted == (0 until 24), s"got $seen")
    assert(seen.flatten.size == 24, s"lost or duplicated rows: $seen")
  }

  test("corrupt checkpoint logs fail loudly with the format error") {
    val dir = Files.createTempDirectory("scbf-stream-x").toString
    val ckpt = Files.createTempDirectory("scbf-stream-x-ckpt").toString
    writeBatch(dir, 0 until 3)
    val q = spark.readStream.format("scbf").schema(schema).load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    try q.processAllAvailable() finally q.stop()
    val logDir = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString == "scbf-file-batches")
      .findFirst().get()
    // clobber the batch-1 delta with a non-numeric length field (and
    // drop the local-FS checksum sidecar so OUR parser sees the bytes,
    // not Hadoop's ChecksumException)
    java.nio.file.Files.writeString(logDir.resolve("1"), "some/path\tnot-a-number")
    java.nio.file.Files.deleteIfExists(logDir.resolve(".1.crc"))
    writeBatch(dir, 3 until 5)
    val q2 = spark.readStream.format("scbf").schema(schema).load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.isInstanceOf[graft.scbf.ScbfFormatException]),
      s"expected ScbfFormatException in cause chain, got: ${causes(e).map(_.getClass.getSimpleName)}")
  }

  // ---- discovery-log incremental file discovery ----

  test("discovery log: incremental triggers plan with ZERO data-directory listings") {
    val dir = Files.createTempDirectory("scbf-disc").toString
    val ckpt = Files.createTempDirectory("scbf-disc-ckpt").toString
    writeBatch(dir, 0 until 5) // connector write → creates the discovery log
    assert(new java.io.File(dir, ".scbf.discovery").isDirectory,
      "connector append did not create the discovery log")
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", 0) // never reconcile: every post-baseline trigger is incremental
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable() // trigger 1: full-listing baseline
      // connector appends announce themselves; the stream must discover
      // them from the log deltas alone (counter reset AFTER the write —
      // the write path takes its own listings)
      writeBatch(dir, 5 until 9)
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(ScbfDataSource.listings.get == 0,
        "an incremental trigger took a full data-directory listing")
      // no-change triggers are also listing-free
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(ScbfDataSource.listings.get == 0,
        "a no-change trigger took a full data-directory listing")
      writeBatch(dir, 9 until 12)
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(ScbfDataSource.listings.get == 0)
    } finally q.stop()
    assert(seen.flatten.sorted == (0 until 12), s"got $seen")
    assert(seen.flatten.size == 12, s"lost or duplicated rows: $seen")
  }

  test("discovery log: a PARTITIONED append is discovered incrementally (subdir-relative delta names)") {
    // partitioned writes announce `grp=x/file.scbf` names to the ROOT
    // log; the stream source must resolve those against the table root
    // and admit files in partition subdirectories — including a
    // partition directory that did not exist at baseline — with zero
    // data-directory listings
    val name = "graft_pt_stream"
    val dir = Files.createTempDirectory("scbf-part-stream").toString
    val ckpt = Files.createTempDirectory("scbf-part-stream-ckpt").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id INT, grp STRING) " +
      s"USING scbf PARTITIONED BY (grp) LOCATION '$dir'")
    spark.sql(s"INSERT INTO $name VALUES (0, 'a'), (1, 'b')")
    val ptSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val seen = mutable.ArrayBuffer.empty[Seq[(Int, String)]]
    val q = spark.readStream.format("scbf").schema(ptSchema)
      .option("reconcileEvery", 0)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen += df.select("id", "grp").as[(Int, String)].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable() // baseline listing
      // new rows into an existing partition AND a brand-new one
      spark.sql(s"INSERT INTO $name VALUES (2, 'a'), (3, 'c')")
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(ScbfDataSource.listings.get == 0,
        "a partitioned append forced a full data-directory listing")
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
    assert(seen.flatten.map(_._1).sorted == Seq(0, 1, 2, 3), s"got $seen")
    assert(seen.flatten.toMap == Map(0 -> "a", 1 -> "b", 2 -> "a", 3 -> "c"), s"got $seen")
  }

  test("discovery log: a maxFilesPerTrigger-capped backlog drains fully without re-listing") {
    val dir = Files.createTempDirectory("scbf-disc-cap").toString
    val ckpt = Files.createTempDirectory("scbf-disc-cap-ckpt").toString
    writeBatch(dir, 0 until 2)
    val batches = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", 0).option("maxFilesPerTrigger", 1)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // three new single-file appends → three deltas, consumed on the
      // FIRST post-write trigger; the capped tail must carry over in
      // memory (a consumed delta is never re-read) until drained
      (0 until 3).foreach(i => writeBatch(dir, 2 + i * 2 until 4 + i * 2))
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(ScbfDataSource.listings.get == 0,
        "draining the capped backlog took a full listing")
    } finally q.stop()
    assert(batches.flatten.sorted == (0 until 8), s"backlog stranded: $batches")
    assert(batches.forall(_.size <= 2), s"a batch exceeded 1 file x 2 rows: $batches")
  }

  test("discovery log: reconcile listing catches files published outside the connector") {
    val dir = Files.createTempDirectory("scbf-disc-rec").toString
    val ckpt = Files.createTempDirectory("scbf-disc-rec-ckpt").toString
    writeBatch(dir, 0 until 3)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", 2) // triggers 2, 4, 6… re-list
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // an external producer drops a file in WITHOUT announcing it
      val extSchema = graft.scbf.ScbfSchema(Seq(
        graft.scbf.ScbfColumn("id", graft.scbf.ScbfType.Int32),
        graft.scbf.ScbfColumn("name", graft.scbf.ScbfType.Utf8)))
      val bos = new java.io.ByteArrayOutputStream()
      graft.scbf.ScbfWriter.write(bos, extSchema, Seq(
        graft.scbf.IntColumnData(Array(100, 101)),
        graft.scbf.Utf8ColumnData(Array("n100".getBytes, "n101".getBytes))), Some(2L))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "external-0.scbf"), bos.toByteArray)
      // within reconcileEvery triggers the listing picks it up (the
      // trigger loop runs continuously; poll until the even-numbered
      // reconcile trigger has landed)
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
          seen.synchronized(seen.flatten.size) < 5) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
    } finally q.stop()
    assert(seen.flatten.sorted == ((0 until 3) ++ Seq(100, 101)), s"got $seen")
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

  test("startingVersion: a fresh stream begins at the point and stays incremental") {
    val dir = Files.createTempDirectory("scbf-stream-sv").toString
    val ckpt = Files.createTempDirectory("scbf-stream-sv-ckpt").toString
    writeBatch(dir, 0 until 10)   // version 0
    writeBatch(dir, 10 until 20)  // version 1
    writeBatch(dir, 20 until 30)  // version 2
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    def run(): Unit = {
      val q = spark.readStream.format("scbf").schema(schema)
        .option("startingVersion", 0) // exclusive: post-version-0 only
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // exactly the post-version-0 files: versions 1+2, never wave 0
    assert(seen.flatten.sorted == (10 until 30), s"got $seen")
    // stays incremental: new appends deliver; a RESTART recovers the
    // skip from the checkpoint (the pre-point files never re-deliver)
    writeBatch(dir, 30 until 35)
    run()
    assert(seen.flatten.sorted == (10 until 35), s"got $seen")
  }

  test("startingVersion under a capped backlog: reconciles and restarts never leak pre-point rows") {
    val dir = Files.createTempDirectory("scbf-stream-svc").toString
    val ckpt = Files.createTempDirectory("scbf-stream-svc-ckpt").toString
    (0 until 12).foreach(i => writeBatch(dir, i * 10 until (i + 1) * 10)) // v0..v11 pre
    (12 until 18).foreach(i => writeBatch(dir, i * 10 until (i + 1) * 10)) // v12.. post
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    def run(): Unit = {
      // cap 2 files/trigger + reconcile every 3rd trigger: the drain
      // crosses several full-listing triggers — the demotion must have
      // landed WHOLE in the seen set at the baseline (sentinels are
      // cap-exempt) or a reconcile would re-admit pre-point files with
      // real lengths
      val q = spark.readStream.format("scbf").schema(schema)
        .option("startingVersion", 11)
        .option("maxFilesPerTrigger", 2)
        .option("reconcileEvery", 3)
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.flatten.sorted == (120 until 180), s"got ${seen.flatten.sorted}")
    // restart mid-life: recovery must come from the seen set (never a
    // re-resolution) and still never deliver pre-point rows
    writeBatch(dir, 180 until 190)
    run()
    assert(seen.flatten.sorted == (120 until 190), s"got ${seen.flatten.sorted}")
  }

  test("startingTimestamp: the timestamp spelling, same exclusive window") {
    val dir = Files.createTempDirectory("scbf-stream-st").toString
    val ckpt = Files.createTempDirectory("scbf-stream-st-ckpt").toString
    writeBatch(dir, 0 until 5)
    Thread.sleep(5)
    val t1 = System.currentTimeMillis()
    writeBatch(dir, 5 until 12)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("startingTimestamp", t1)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.flatten.sorted == (5 until 12), s"got $seen")
  }

  test("startingVersion misuse refuses loudly") {
    val dir = Files.createTempDirectory("scbf-stream-svm").toString
    writeBatch(dir, 0 until 5)
    // batch read with the stream option
    val e2 = intercept[Exception](
      spark.read.format("scbf").option("startingVersion", 0).load(dir).count())
    assert(e2.getMessage != null &&
      (e2.getMessage.contains("readStream") ||
        Option(e2.getCause).exists(_.getMessage.contains("readStream"))),
      s"got $e2")
    // stream misuse surfaces at/by the first trigger, loudly
    def failsWith(opts: Seq[(String, String)], frag: String): Unit = {
      val ckpt = Files.createTempDirectory("scbf-stream-svm-ckpt").toString
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
      val msgs =
        try {
          val r0 = spark.readStream.format("scbf").schema(schema)
          val q = opts.foldLeft(r0) { case (r, (k, v)) => r.option(k, v) }
            .load(dir)
            .writeStream.option("checkpointLocation", ckpt)
            .format("noop").start()
          try {
            val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
              q.processAllAvailable()
            }
            chain(e)
          } finally q.stop()
        } catch { // option combos that refuse at scan build (pre-start)
          case e: org.apache.spark.sql.streaming.StreamingQueryException => chain(e)
          case scala.util.control.NonFatal(e) => chain(e)
        }
      assert(msgs.exists(_.contains(frag)), s"got $msgs")
    }
    failsWith(Seq("startingVersion" -> "0", "startingTimestamp" -> "1"),
      "not both")
    failsWith(Seq("startingTimestamp" ->
      (System.currentTimeMillis() + 3600000L).toString), "in the future")
    failsWith(Seq("startingVersion" -> "99"), "recorded commits")
  }
}
