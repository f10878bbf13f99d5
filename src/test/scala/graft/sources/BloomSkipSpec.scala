package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Equality/IN file skipping via per-file Bloom sidecars (ScbfBloom):
 * the layer that prunes point lookups on UNCLUSTERED high-cardinality
 * columns, where every file spans the whole min/max range and interval
 * stats can never exclude anything. No false negatives by construction,
 * so results are identical with blooms present, absent, stale, or
 * disabled — skipping is a pure planning optimization. */
class BloomSkipSpec extends AnyFunSuite with SparkTestBase {

  /** Round-robin layout: each of 4 files holds ids from the FULL
   * 0..999 range (interleaved), so min/max admits every file for any
   * in-range point lookup — the layout blooms exist for. */
  private def writeRoundRobin(dir: String, bloomOpt: Option[Int] = None): Unit = {
    val w = spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartition(4) // round-robin: every file spans the whole id range
      .write.format("scbf").mode("overwrite")
    bloomOpt.fold(w)(c => w.option("bloomMaxBytes", c.toString)).save(dir)
  }

  private def scbfFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    p.getFileSystem(new Configuration())
      .listStatus(p).toSeq.map(_.getPath)
      .filter(x => x.getName.endsWith(".scbf") && !x.getName.startsWith("."))
  }

  private def planned(dir: String, filters: Filter*): Int = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[ScbfScan].planInputPartitions().length
  }

  test("builder/member round trip: no false negatives, low false-positive rate") {
    val b = new ScbfBloom.Builder(rows = 1000, maxBytes = ScbfBloom.DefaultMaxBytes)
    (0 until 1000).foreach(i => b.add(ScbfBloom.encodeInt(i)))
    val cb = b.result
    // Bloom's contract: a present value is NEVER reported absent
    assert((0 until 1000).forall(i => cb.mayContain(ScbfBloom.encodeInt(i))))
    // statistical sanity at 10 bits/key, k=7: FPR ≈ 1%; allow 10×
    val fp = (100000 until 101000).count(i => cb.mayContain(ScbfBloom.encodeInt(i)))
    assert(fp < 100, s"false-positive rate implausibly high: $fp/1000")
  }

  test("a point lookup on an unclustered column plans ~1 file; range stats alone plan all") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom").toString
    writeRoundRobin(dir)
    val conf = new Configuration()
    assert(scbfFiles(dir).size == 4)
    // every file carries a bloom sidecar
    scbfFiles(dir).foreach { f =>
      val len = f.getFileSystem(conf).getFileStatus(f).getLen
      assert(ScbfBloom.read(f, len, conf).isDefined, s"missing bloom for $f")
    }
    // min/max is powerless on MID-RANGE values in this layout (every
    // file samples ~1/4 of 0..999, so all spans cover 500); the bloom
    // prunes the point lookup to the one file that holds the value
    // (FPR at these sizes is ~1%, so "exactly 1" is deterministic for a
    // fixed dataset — if a hash collision ever kept a second file the
    // result would still be correct, just less pruned)
    assert(planned(dir, EqualTo("id", 500)) == 1, "int point lookup → 1 file")
    assert(planned(dir, EqualTo("tag", "row500")) == 1, "utf8 point lookup → 1 file")
    // IN over values landing in different files plans their union
    val inPlanned = planned(dir, In("id", Array[Any](500, 501, 502, 503)))
    assert(inPlanned >= 1 && inPlanned <= 4)
    // a value nothing contains plans zero files
    assert(planned(dir, EqualTo("tag", "no-such-row")) == 0)
    // delete the blooms: min/max admits everything again
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".bloom"))
      .foreach(f => fs.delete(f.getPath, false))
    assert(planned(dir, EqualTo("id", 500)) == 4,
      "no blooms → min/max admits a mid-range value everywhere")
  }

  test("bloom reads are lazy: range-only filters never open a bloom; survivors only") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-lazy").toString
    // range-partitioned layout: min/max already prunes point lookups
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    ScbfBloom.bloomReads.set(0)
    assert(planned(dir, LessThan("id", 250)) == 1)
    assert(ScbfBloom.bloomReads.get == 0,
      "a range filter can never profit from a bloom — none may be read")
    ScbfBloom.bloomReads.set(0)
    assert(planned(dir, EqualTo("id", 10)) == 1)
    assert(ScbfBloom.bloomReads.get == 1,
      "equality reads blooms only for files surviving min/max pruning")
  }

  test("malformed bloom files degrade to keep — planning never throws") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-corrupt").toString
    writeRoundRobin(dir)
    val conf = new Configuration()
    val f = scbfFiles(dir).head
    val fs = f.getFileSystem(conf)
    val len = fs.getFileStatus(f).getLen
    val bp = ScbfBloom.bloomPath(f)
    // parseable-but-malformed variants: zero m (membership would divide
    // by zero), short bit array (would index out of bounds), zero k,
    // non-multiple-of-64 m, plus plain garbage and a wrong header
    val b64 = java.util.Base64.getEncoder.encodeToString(new Array[Byte](8))
    val variants = Seq(
      s"bloomv1\nlen\t$len\ncol\tid\t7\t0\t$b64\n",
      s"bloomv1\nlen\t$len\ncol\tid\t7\t4096\t$b64\n",
      s"bloomv1\nlen\t$len\ncol\tid\t0\t64\t$b64\n",
      s"bloomv1\nlen\t$len\ncol\tid\t7\t100\t$b64\n",
      s"bloomv1\nlen\t$len\ncol\tid\t7\tnotanumber\t$b64\n",
      "complete garbage\nwith lines\n",
      s"wrongheader\nlen\t$len\ncol\tid\t7\t64\t$b64\n")
    variants.foreach { content =>
      val out = fs.create(bp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      // the doctored file must KEEP under a point lookup it can no
      // longer decide (the other three files still prune normally,
      // except when their blooms legitimately exclude the value)
      val n = planned(dir, EqualTo("id", 500))
      assert(n >= 1 && n <= 2, s"planned $n under corrupt bloom: $content")
      val got = spark.read.format("scbf").load(dir).filter(col("id") === 500)
        .select("id").collect().map(_.getInt(0)).toSeq
      assert(got == Seq(500), s"row lost under corrupt bloom: $content")
    }
  }

  test("a stale bloom (data file replaced out-of-band) is ignored, not trusted") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-stale").toString
    writeRoundRobin(dir)
    val conf = new Configuration()
    val f = scbfFiles(dir).head
    val fs = f.getFileSystem(conf)
    // grow the data file by a byte: every guard (stats + bloom) must
    // now disagree with the live listing and fall back to keeping
    val bytes = {
      val in = fs.open(f)
      val len = fs.getFileStatus(f).getLen.toInt
      val buf = new Array[Byte](len)
      try in.readFully(0, buf) finally in.close()
      buf
    }
    val out = fs.create(f, true)
    try { out.write(bytes); out.write(0) } finally out.close()
    val len = fs.getFileStatus(f).getLen
    assert(ScbfBloom.read(f, len, conf).isEmpty, "stale bloom must read as None")
    // the replaced file plans under every filter (its guards all miss);
    // the three untouched files still bloom-prune
    assert(planned(dir, EqualTo("tag", "no-such-row")) == 1,
      "only the guard-missed file survives an impossible lookup")
  }

  test("results identical with blooms on and off; bloomMaxBytes=0 disables generation") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-e2e").toString
    writeRoundRobin(dir)
    val expect = (0 until 1000 by 97).map(i => (i, s"row$i")).toSet
    val got = spark.read.format("scbf").load(dir)
      .filter(col("id") % 97 === 0)
      .select("id", "tag").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == expect)
    // equality path end-to-end (bloom pruning active under the hood)
    val one = spark.read.format("scbf").load(dir).filter(col("tag") === "row421")
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(one == Seq(421))
    // opt-out: no bloom sidecars written at all
    val dir2 = java.nio.file.Files.createTempDirectory("scbf-bloom-off").toString
    writeRoundRobin(dir2, bloomOpt = Some(0))
    val p2 = new Path(dir2)
    val fs2 = p2.getFileSystem(new Configuration())
    assert(!fs2.listStatus(p2).exists(_.getPath.getName.endsWith(".bloom")))
    assert(planned(dir2, EqualTo("id", 500)) == 4)
  }

  test("the streaming SOURCE prunes through blooms exactly like the batch scan") {
    // round-robin layout: only the blooms can prune the point lookup,
    // and the micro-batch planner goes through the same Pruner.keepAll
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-src").toString
    writeRoundRobin(dir)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val schema = spark.read.format("scbf").load(dir).schema
    def plannedStream(filters: Filter*): Int = {
      val ckpt = java.nio.file.Files.createTempDirectory("scbf-bloom-src-ck").toString
      val b = new ScbfScanBuilder(schema, files, conf, tablePaths = Seq(dir))
      b.pushFilters(filters.toArray)
      val ms = b.build().asInstanceOf[ScbfScan].toMicroBatchStream(ckpt)
        .asInstanceOf[ScbfMicroBatchStream]
      val st = ms.initialOffset()
      val en = ms.latestOffset(st,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      ms.planInputPartitions(st, en).length
    }
    assert(plannedStream() == 4)
    assert(plannedStream(EqualTo("id", 500)) == 1,
      "the micro-batch stream must bloom-prune like the batch scan")
    assert(plannedStream(EqualTo("tag", "no-such-row")) == 0)
  }

  test("the streaming sink's files carry blooms; a backfill scan prunes on them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scbf-bloom-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scbf-bloom-ckpt").toString
    val input = MemoryStream[(Int, String)]
    val q = input.toDF().toDF("id", "tag")
      .writeStream.format("scbf").option("checkpointLocation", ckpt)
      .start(dir)
    try {
      input.addData((1, "a1"), (2, "b2"))
      q.processAllAvailable()
      input.addData((3, "c3"), (4, "d4"))
      q.processAllAvailable()
    } finally q.stop()
    val files = scbfFiles(dir)
    assert(files.nonEmpty)
    val conf = new Configuration()
    files.foreach { f =>
      val len = f.getFileSystem(conf).getFileStatus(f).getLen
      assert(ScbfBloom.read(f, len, conf).isDefined,
        s"streaming-written $f lacks a bloom sidecar")
    }
    // a point lookup over the sink's output prunes to the holding file
    assert(planned(dir, EqualTo("tag", "c3")) < files.size || files.size == 1)
    val got = spark.read.format("scbf").load(dir).filter(col("tag") === "c3")
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3))
  }
}
