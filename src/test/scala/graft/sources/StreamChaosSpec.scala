package graft.sources

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Model-based chaos test of STREAMING delivery under interleaved
 * maintenance — the streaming complement of [[ConnectorChaosSpec]]
 * (which pins batch-read correctness over the same op mix). A seeded
 * random sequence of append / DELETE / UPDATE / cluster / zorder /
 * vacuum runs against a live consumer, with a coin-flip on whether the
 * stream triggers between ops, so every transparency mechanism gets
 * exercised in random COMBINATION: covered rewrites skipping via the
 * sentinel, transitive coverage across maintenance chains, the
 * same-trigger preference when an append and its rewrite arrive in one
 * trigger, restart recovery of the seen set mid-sequence.
 *
 * The delivery model is EXACT at FILE granularity, driven by
 * observation rather than prediction: each mutating op is bracketed by
 * a listing, and the (removed, added) diff applies the pinned
 * admission rules —
 *  - removed ⊆ seenModel (delivered, or admitted seen-without-delivery
 *    as a covered rewrite): the op is a COVERED rewrite; its outputs
 *    join seenModel silently and nothing is ever delivered for them
 *    (onChangeCommit=skip, the no-CDC default; OPTIMIZE sentinel);
 *  - otherwise it is UNCOVERED: its outputs become deliverable, the
 *    still-undelivered removed names drop from the pending set
 *    (same-trigger preference / not-listed-after-rewrite), and
 *    already-delivered rows folded into the outputs re-deliver
 *    ("completeness beats dedup").
 * Every trigger then must plan EXACTLY the pending file set, and
 * deliver exactly those files' current contents. The model needs no
 * knowledge of which files a DELETE's stats-scoping decides to
 * rewrite — the observed diff IS that decision.
 *
 * Driven at the MicroBatchStream level (a query's own triggers would
 * race the op sequence); every planned path is asserted to exist, so
 * "planned a maintenance-deleted file" fails loudly rather than
 * flaking at read time.
 */
object StreamChaosSpec {
  case class R(id: Int, n: Int, src: String)
}

class StreamChaosSpec extends AnyFunSuite with SparkTestBase {

  import StreamChaosSpec.R

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("src", StringType, nullable = false)))

  private def writeRows(dir: String, rows: Seq[R]): Unit = {
    import spark.implicits._
    rows.toDF("id", "n", "src")
      .repartition(2)
      .write.format("scbf").mode("append").save(dir)
  }

  private def sorted(rows: Seq[R]): Seq[R] = rows.sortBy(r => (r.id, r.n, r.src))

  private def toR(r: org.apache.spark.sql.Row): R =
    R(r.getAs[Int]("id"), r.getAs[Int]("n"), r.getAs[String]("src"))

  private def runSeed(seed: Int, steps: Int): Unit = {
    val rnd = new Random(seed)
    val dir = tmpDir(s"scbf-stream-chaos-$seed")
    val ckpt = Files.createTempDirectory(s"scbf-stream-chaos-ckpt-$seed").toString
    val conf = new Configuration()
    val fs = new Path(dir).getFileSystem(conf)

    def liveFiles(): Set[String] =
      fs.listStatus(new Path(dir)).filter(_.isFile).map(_.getPath.getName)
        .filter(n => n.endsWith(graft.scbf.Scbf.FileExtension) && !n.startsWith("."))
        .toSet
    def rowsOf(names: Set[String]): Seq[R] =
      if (names.isEmpty) Seq.empty
      else spark.read.format("scbf")
        .load(names.map(n => s"$dir/$n").toSeq: _*).collect().map(toR).toSeq

    var nextId = 0
    def fresh(k: Int): Seq[R] = (0 until k).map { _ =>
      val id = nextId; nextId += 1
      R(id, rnd.nextInt(1000), s"s${rnd.nextInt(4)}")
    }

    // the batch-side model (exact table contents) …
    var table: Seq[R] = fresh(100)
    // … and the stream-side model: file names the next trigger must
    // plan, and names the stream has accounted for (delivered or
    // sentinel-admitted) — coverage is decided against seenModel
    val pendingFiles = mutable.Set.empty[String]
    val seenModel = mutable.Set.empty[String]
    val deliveredModel = mutable.ArrayBuffer.empty[R]
    val deliveredActual = mutable.ArrayBuffer.empty[R]
    val history = mutable.ArrayBuffer.empty[String]

    def mutate(op: => Unit): (Set[String], Set[String]) = {
      val pre = liveFiles(); op; val post = liveFiles()
      (pre -- post, post -- pre)
    }
    /** The admission rule for an observed rewrite diff (skip policy). */
    def applyRewrite(removed: Set[String], added: Set[String]): String =
      if (removed.isEmpty) "no-op"
      else if (removed.subsetOf(seenModel)) {
        seenModel ++= added // covered: sentinel-admitted, never delivered
        "covered"
      } else {
        // uncovered: outputs deliver in full; undelivered replaced
        // names drop (their data files are gone); replaced covered
        // outputs leave seenModel's future-coverage role to `added`
        pendingFiles --= removed
        pendingFiles ++= added
        "uncovered"
      }

    val (_, first) = mutate(writeRows(dir, table))
    pendingFiles ++= first

    def mkStream() = new ScbfMicroBatchStream(schema, Seq(dir), conf, ckpt,
      reconcileEvery = 0)
    var stream = mkStream()
    var off = ScbfOffset(0)

    def trig(label: String): Unit = {
      val expected = rowsOf(pendingFiles.toSet) // current on-disk contents
      val next = stream.latestOffset(off, ReadLimit.allAvailable())
        .asInstanceOf[ScbfOffset]
      val (plannedNames, rows): (Set[String], Seq[R]) =
        if (next.batch == off.batch) (Set.empty, Seq.empty)
        else {
          val planned = stream.planInputPartitions(off, next)
            .map(_.asInstanceOf[ScbfFilePartition].path)
          planned.foreach(p => assert(fs.exists(new Path(p)),
            s"[$label] planned a maintenance-deleted file: $p\n${history.mkString("\n")}"))
          val r = if (planned.isEmpty) Seq.empty[R]
            else spark.read.format("scbf").load(planned: _*).collect().map(toR).toSeq
          (planned.map(p => new Path(p).getName).toSet, r)
        }
      off = next
      assert(plannedNames == pendingFiles.toSet,
        s"[$label] planned $plannedNames, model expects ${pendingFiles.toSet}\n" +
          history.mkString("\n"))
      assert(sorted(rows) == sorted(expected),
        s"[$label] delivered ${rows.size} rows, model expected ${expected.size}\n" +
          history.mkString("\n"))
      deliveredActual ++= rows
      deliveredModel ++= expected
      seenModel ++= pendingFiles
      pendingFiles.clear()
    }

    trig("baseline")

    for (step <- 1 to steps) {
      val label = rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 => // append
          val rows = fresh(10 + rnd.nextInt(40))
          val (_, added) = mutate(writeRows(dir, rows))
          table ++= rows; pendingFiles ++= added
          s"append ${rows.size}"
        case 4 | 5 => // OPTIMIZE cluster: row-preserving whole-snapshot rewrite
          if (table.nonEmpty) {
            val (rm, ad) = mutate(
              ScbfMaintenance.cluster(spark, dir, Seq("id"), 1 + rnd.nextInt(3)))
            s"cluster (${applyRewrite(rm, ad)})"
          } else "cluster skipped (empty)"
        case 6 => // OPTIMIZE zorder: same contract as cluster
          if (table.nonEmpty) {
            val (rm, ad) = mutate(ScbfMaintenance.zorder(spark, dir,
              Seq("id", "n"), 1 + rnd.nextInt(3), bits = 4))
            s"zorder (${applyRewrite(rm, ad)})"
          } else "zorder skipped (empty)"
        case 7 => // vacuum: janitorial only, never visible to the stream
          val (rm, ad) = mutate(ScbfMaintenance.vacuum(spark, dir, olderThanMs = 0L))
          assert(rm.isEmpty && ad.isEmpty, "vacuum must not touch live data files")
          "vacuum"
        case 8 | 9 => // DELETE: lazy too — the observed diff is the scope
          val lo = rnd.nextInt(math.max(1, nextId))
          val hi = lo + rnd.nextInt(80)
          val (rm, ad) = mutate(ScbfDelete.deleteWhere(spark, dir, conf,
            Array[Filter](GreaterThanOrEqual("id", lo), LessThan("id", hi))))
          table = table.filterNot(r => r.id >= lo && r.id < hi)
          s"delete id in [$lo,$hi) (${applyRewrite(rm, ad)})"
        case _ => // UPDATE: the no-CDC contract under every interleaving
          val lo = rnd.nextInt(math.max(1, nextId))
          val hi = lo + rnd.nextInt(120)
          val (rm, ad) = mutate(ScbfDelete.updateWhere(spark, dir, conf,
            Array[Filter](GreaterThanOrEqual("id", lo), LessThan("id", hi)),
            Map("src" -> lit("redacted"), "n" -> (col("n") + 1000))))
          table = table.map(r =>
            if (r.id >= lo && r.id < hi) r.copy(src = "redacted", n = r.n + 1000)
            else r)
          s"update id in [$lo,$hi) (${applyRewrite(rm, ad)})"
      }
      history += s"step $step: $label"
      if (rnd.nextInt(6) == 0) { // restart: seen set recovers from logs
        stream = mkStream()
        history += s"step $step: restart"
      }
      if (rnd.nextInt(3) != 0) trig(s"step $step after [$label]")
    }

    trig("final")
    assert(sorted(deliveredActual.toSeq) == sorted(deliveredModel.toSeq),
      s"cumulative delivery diverged\n${history.mkString("\n")}")
    // and the table itself is still batch-exact (ConnectorChaosSpec's
    // invariant, re-checked here because the op mix differs)
    val got = spark.read.format("scbf").load(dir).collect().map(toR).toSeq
    assert(sorted(got) == sorted(table),
      s"final table contents diverged\n${history.mkString("\n")}")
  }

  test("random maintenance interleavings deliver exactly the model (seed 11)") {
    runSeed(11, 16)
  }
  test("random maintenance interleavings deliver exactly the model (seed 12)") {
    runSeed(12, 16)
  }
  test("random maintenance interleavings deliver exactly the model (seed 13)") {
    runSeed(13, 16)
  }

  test("OPTIMIZE over a lagging consumer re-delivers the snapshot, exactly (deterministic)") {
    // the uncovered-rewrite leg of the model, pinned without seed
    // luck: deliver 0..9, append 10..19 WITHOUT a trigger, cluster.
    // The outputs fold a delivered file and an undelivered one, so
    // they are uncovered -> the next trigger delivers the outputs'
    // full content (0..19: completeness beats dedup, 0..9 re-deliver)
    // and drops the folded-in append files (same-trigger preference —
    // their data files are already deleted).
    val dir = tmpDir("scbf-stream-lagopt")
    val ckpt = Files.createTempDirectory("scbf-stream-lagopt-ckpt").toString
    val conf = new Configuration()
    def rows(r: Range): Seq[R] = r.map(i => R(i, i * 2, s"s${i % 3}"))
    writeRows(dir, rows(0 until 10))
    val stream = new ScbfMicroBatchStream(schema, Seq(dir), conf, ckpt,
      reconcileEvery = 0)
    def trig(from: ScbfOffset): ScbfOffset =
      stream.latestOffset(from, ReadLimit.allAvailable()).asInstanceOf[ScbfOffset]
    val o1 = trig(ScbfOffset(0))
    val base = stream.planInputPartitions(ScbfOffset(0), o1)
      .map(_.asInstanceOf[ScbfFilePartition].path)
    assert(spark.read.format("scbf").load(base: _*).count() == 10)
    writeRows(dir, rows(10 until 20)) // lagging: no trigger yet
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 2)
    val o2 = trig(o1)
    assert(o2.batch == o1.batch + 1, "the uncovered rewrite must be admitted")
    val planned = stream.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[ScbfFilePartition].path)
    val fs = new Path(dir).getFileSystem(conf)
    planned.foreach(p => assert(fs.exists(new Path(p)),
      s"planned a maintenance-deleted file: $p"))
    val got = spark.read.format("scbf").load(planned: _*).collect().map(toR)
    assert(sorted(got.toSeq) == sorted(rows(0 until 20)),
      s"lagging OPTIMIZE must deliver the full snapshot once: got ${got.length} rows")
    // and the consumer is caught up: a further rewrite is silent
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
    val o3 = trig(o2)
    if (o3.batch != o2.batch) {
      assert(stream.planInputPartitions(o2, o3).isEmpty,
        "a covered rewrite after catch-up must deliver nothing")
    }
  }
}
