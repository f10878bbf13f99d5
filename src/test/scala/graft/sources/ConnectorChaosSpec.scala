package graft.sources

import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Model-based chaos test of the connector's mutation surface: a seeded
 * random sequence of append / DELETE / UPDATE / cluster / zorder /
 * vacuum, validated against an in-memory model AFTER EVERY STEP —
 * table contents exact, row count exact, manifest keys ⊆ live files.
 * Individual specs pin each op; this pins their INTERACTIONS (e.g. a
 * delete right after a zorder rewrite, an update over files a cluster
 * just produced, appends interleaved with maintenance), which is where
 * copy-on-write machinery historically breaks.
 */
object ConnectorChaosSpec {
  case class R(id: Int, n: Int, src: String)
}

class ConnectorChaosSpec extends AnyFunSuite with SparkTestBase {

  import ConnectorChaosSpec.R

  private def writeRows(dir: String, rows: Seq[R], mode: String): Unit = {
    import spark.implicits._
    rows.toDF("id", "n", "src")
      .repartition(2)
      .write.format("scbf").mode(mode).save(dir)
  }

  private def readBack(dir: String): Seq[R] =
    spark.read.format("scbf").load(dir).collect()
      .map(r => R(r.getInt(0), r.getInt(1), r.getString(2))).toSeq

  private def check(dir: String, model: Seq[R], step: String): Unit = {
    val got = readBack(dir).sortBy(r => (r.id, r.n, r.src))
    val want = model.sortBy(r => (r.id, r.n, r.src))
    assert(got == want,
      s"divergence after [$step]: got ${got.size} rows, want ${want.size}; " +
        s"firstDiff=${got.zip(want).find(p => p._1 != p._2).orElse(
          Some((got.drop(want.size).headOption, want.drop(got.size).headOption)))}")
    val conf = new Configuration()
    val live = ScbfDataSource.resolveFiles(Seq(dir), conf).map(_.getPath.getName).toSet
    val man = ScbfStats.readManifest(new Path(dir), conf)
    assert(man.keySet.subsetOf(live),
      s"stale manifest keys after [$step]: ${man.keySet -- live}")
  }

  private def runSeed(seed: Int, steps: Int): Unit = {
    val rnd = new Random(seed)
    val dir = tmpDir(s"scbf-chaos-$seed")
    var nextId = 0
    def fresh(k: Int): Seq[R] = {
      val rows = (0 until k).map { _ =>
        val id = nextId; nextId += 1
        R(id, rnd.nextInt(1000), s"s${rnd.nextInt(4)}")
      }
      rows
    }
    var model: Seq[R] = fresh(200)
    writeRows(dir, model, "overwrite")
    check(dir, model, "initial overwrite")
    val conf = new Configuration()
    for (step <- 1 to steps) {
      val op = rnd.nextInt(10)
      val label = op match {
        case 0 | 1 | 2 => // append
          val rows = fresh(20 + rnd.nextInt(60))
          writeRows(dir, rows, "append")
          model ++= rows
          s"append ${rows.size}"
        case 3 | 4 => // ranged delete
          val lo = rnd.nextInt(math.max(1, nextId))
          val hi = lo + rnd.nextInt(80)
          ScbfDelete.deleteWhere(spark, dir, conf,
            Array[Filter](GreaterThanOrEqual("id", lo), LessThan("id", hi)))
          model = model.filterNot(r => r.id >= lo && r.id < hi)
          s"delete id in [$lo,$hi)"
        case 5 => // source delete
          val s = s"s${rnd.nextInt(4)}"
          ScbfDelete.deleteWhere(spark, dir, conf, Array[Filter](EqualTo("src", s)))
          model = model.filterNot(_.src == s)
          s"delete src=$s"
        case 6 => // update: relabel + bump n in an id range
          val lo = rnd.nextInt(math.max(1, nextId))
          val hi = lo + rnd.nextInt(120)
          ScbfDelete.updateWhere(spark, dir, conf,
            Array[Filter](GreaterThanOrEqual("id", lo), LessThan("id", hi)),
            Map("src" -> lit("redacted"), "n" -> (col("n") + 1000)))
          model = model.map(r =>
            if (r.id >= lo && r.id < hi) r.copy(src = "redacted", n = r.n + 1000) else r)
          s"update id in [$lo,$hi)"
        case 7 => // OPTIMIZE cluster
          ScbfMaintenance.cluster(spark, dir, Seq("id"), 1 + rnd.nextInt(4))
          "cluster"
        case 8 => // OPTIMIZE zorder (needs rows; guard the empty table)
          if (model.nonEmpty) {
            ScbfMaintenance.zorder(spark, dir, Seq("id", "n"), 1 + rnd.nextInt(4), bits = 4)
            "zorder"
          } else "zorder skipped (empty)"
        case 9 =>
          ScbfMaintenance.vacuum(spark, dir, olderThanMs = 0L)
          "vacuum"
      }
      check(dir, model, s"step $step: $label")
    }
  }

  test("random op sequences match the model exactly (seed 1)") { runSeed(1, 14) }
  test("random op sequences match the model exactly (seed 2)") { runSeed(2, 14) }
}
