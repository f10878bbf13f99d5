package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** m6 collapses perceptually-identical (noisy-variant) images by
 * average-hash. The oracle checks the arithmetic mirror; this spec
 * checks the ENGINE-side truth: the hash really is noise-invariant on
 * decoded rasters, really changes when content changes, grouped docs
 * are NOT byte-identical (exact dedup could not find them), and the
 * keeper invariants hold end-to-end. */
class ImagePhashSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("aHash is noise-invariant: same pattern, different ids, different bytes, one hash") {
    (0L until 40L).foreach { id =>
      val a = PpmCodec.synthesizeNoisy(id)
      val b = PpmCodec.synthesizeNoisy(id + 257)
      val c = PpmCodec.synthesizeNoisy(id + 2 * 257)
      assert(!java.util.Arrays.equals(
        PpmCodec.decode(a).raster, PpmCodec.decode(b).raster),
        s"id $id: noisy variants are byte-identical — fixture lost its signal")
      val hashes = Seq(a, b, c).map(x => PpmCodec.aHash(PpmCodec.decode(x)))
      assert(hashes.distinct.size == 1, s"id $id: $hashes")
    }
  }

  test("aHash equals the arithmetic bit-plan the oracle recomputes") {
    (0L until 600L).foreach { id =>
      val p = (id % 257).toInt
      val img = PpmCodec.decode(PpmCodec.synthesizeNoisy(id))
      val n = img.width * img.height
      val expected = (0 until n).foldLeft(0L) { (h, j) =>
        if (PpmCodec.patternBit(p, j)) h | (1L << j) else h
      }
      assert(PpmCodec.aHash(img) == expected, s"id $id")
    }
  }

  test("aHash is content-sensitive: brightening a dark pixel flips its bit") {
    val img = PpmCodec.decode(PpmCodec.synthesizeNoisy(3L))
    val before = PpmCodec.aHash(img)
    // pixel 1 is pinned dark by the bit-plan; make it bright
    val raster = img.raster.clone()
    (3 until 6).foreach(i => raster(i) = 244.toByte)
    val after = PpmCodec.aHash(img.copy(raster = raster))
    assert(before != after)
    assert((after & 2L) == 2L && (before & 2L) == 0L)
  }

  test("m6 end-to-end: one keeper per group (the min doc), sizes consistent, dups exist") {
    val rows = TextQueries.queries("m6_image_phash")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    val groups = rows.groupBy(r => (r._2, r._3, r._4))
    groups.foreach { case (k, members) =>
      assert(members.forall(_._6 == members.length), s"group_size mismatch in $k")
      val keepers = members.filter(_._5 == 1).map(_._1)
      assert(keepers.toSeq == Seq(members.map(_._1).min), s"keeper mismatch in $k")
    }
    assert(groups.exists(_._2.length > 1),
      "no perceptual duplicates at this sf — the fixture lost its signal")
  }

  test("m6 plan: winner is a partial-combine aggregate, no window, no cartesian") {
    val p = TextQueries.queries("m6_image_phash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("partial_min".r.findAllIn(p).nonEmpty, p)
  }
}
