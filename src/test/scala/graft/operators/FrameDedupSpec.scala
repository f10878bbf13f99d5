package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** m5 collapses identical decoded frames first-wins across clips. The
 * oracle checks the arithmetic mirror; this spec checks the ENGINE-side
 * truth — grouped frames really are byte-identical after the real
 * container parse — and the keeper invariants. */
class FrameDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("m5 groups are byte-identical frames; keeper is the min (doc, frame); dups exist") {
    val rows = TextQueries.queries("m5_frame_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))

    // re-decode every frame locally and group by exact bytes
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val frames = ids.flatMap { id =>
      PpmCodec.decodeFrames(PpmCodec.synthesizeClip(id)).zipWithIndex.map {
        case (img, f) =>
          ((id, f), (img.width, img.height, img.raster.toSeq))
      }
    }.toMap
    val byContent = frames.groupBy(_._2).map { case (_, m) => m.keySet }

    assert(rows.length == frames.size)
    val got = rows.map(r => ((r._1, r._2), r)).toMap
    byContent.foreach { group =>
      val members = group.toSeq.sorted
      val sizes = members.map(m => got(m)._6).distinct
      assert(sizes == Seq(members.size.toLong),
        s"group_size mismatch for $members")
      val keepers = members.filter(m => got(m)._5 == 1)
      assert(keepers == Seq(members.min), s"keeper mismatch for $members")
    }
    assert(byContent.exists(_.size > 1),
      "no cross-clip duplicate frames — the fixture lost its signal")
  }

  test("m5 plan: winner is a partial-combine aggregate, no window, no cartesian") {
    val p = TextQueries.queries("m5_frame_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("partial_min".r.findAllIn(p).nonEmpty, p)
  }
}
