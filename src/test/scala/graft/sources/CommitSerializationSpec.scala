package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Cross-process commit serialization (round 13): the per-table commit
 * clock was process-local by documented contract — two live drivers
 * appending to one table could interleave same-millisecond stamps.
 * Now every commit (1) re-reads the PERSISTED floor (newest delta
 * name millis) before stamping, so sequentially-interleaved writers
 * from ANY set of processes/restarts produce strictly increasing
 * stamps and ordinals, and (2) CLAIMS its publication millisecond by
 * exclusive create (`claim-<millis>`), so a process racing into the
 * same instant bumps past it instead of sharing it.
 *
 * "Two independent processes" are simulated the only way one JVM can:
 * [[ScbfDiscovery.resetCommitClocks]] wipes the in-memory clock map
 * between appends, so each append sees exactly what a fresh driver
 * would — the persisted chain and nothing else.
 */
class CommitSerializationSpec extends AnyFunSuite with SparkTestBase {

  private def hconf = spark.sessionState.newHadoopConf()

  private def q(dir: String): Path = {
    val p = new Path(dir)
    p.getFileSystem(hconf).makeQualified(p)
  }

  test("interleaved fresh-process appends serialize: stamps and ordinals strictly increase") {
    val dir = tmpDir("scbf-commit-ser")
    val root = q(dir)
    // every append pretends to be a freshly-started driver whose wall
    // clock stepped BACKWARDS (entries stamped at one fixed old
    // instant) — the worst interleaving shape: without the persisted
    // floor each commit would stamp the same millisecond
    val backdated = 1700000000000L
    (0 until 6).foreach { i =>
      ScbfDiscovery.resetCommitClocks()
      ScbfDiscovery.append(root, hconf,
        Seq(ScbfDiscovery.Entry(s"f$i.scbf", 10L + i, backdated)))
    }
    val chain = ScbfDiscovery.versionedChain(root, hconf)
    assert(chain.size == 6 && chain.map(_._3) == (0 until 6))
    // strictly increasing: name millis AND the per-version instants
    val nameMs = chain.map(c => ScbfDiscovery.deltaMillis(c._1).get)
    assert(nameMs == nameMs.sorted && nameMs.distinct == nameMs,
      s"delta name millis must strictly increase: $nameMs")
    val vts = (0 until 6).map(v => ScbfDiscovery.versionTs(root, hconf, v))
    assert(vts == vts.sorted && vts.distinct == vts,
      s"per-version instants must strictly increase: $vts")
  }

  test("a claimed millisecond forces the next committer past it") {
    val dir = tmpDir("scbf-commit-claim")
    val root = q(dir)
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("base.scbf", 1L, System.currentTimeMillis())))
    // another process "holds" a future instant: pre-create its claim
    val m = System.currentTimeMillis() + 60000L
    val fs = root.getFileSystem(hconf)
    fs.mkdirs(ScbfDiscovery.dir(root))
    fs.create(new Path(ScbfDiscovery.dir(root), f"claim-$m%013d"), false).close()
    ScbfDiscovery.resetCommitClocks()
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("next.scbf", 2L, m))) // stamps INTO the claimed ms
    val newest = ScbfDiscovery.commitChain(root, hconf).last
    val newestMs = ScbfDiscovery.deltaMillis(newest).get
    assert(newestMs > m,
      s"the commit must move past the claimed millisecond: $newestMs !> $m")
    // and its entries moved with it (versionTs = max entry stamp)
    assert(ScbfDiscovery.versionTs(root, hconf, 1) > m)
  }

  test("stale claims sweep with compaction; fresh ones survive") {
    val dir = tmpDir("scbf-commit-sweep")
    val root = q(dir)
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("a.scbf", 1L, System.currentTimeMillis())))
    val fs = root.getFileSystem(hconf)
    val d = ScbfDiscovery.dir(root)
    val stale = new Path(d, f"claim-${1000L}%013d")
    fs.create(stale, false).close()
    // drive past the fold threshold — the fold's sweep removes claims
    // an hour older than the newest folded commit
    (0 to ScbfDiscovery.CompactThreshold).foreach { i =>
      ScbfDiscovery.append(root, hconf,
        Seq(ScbfDiscovery.Entry(s"b$i.scbf", 1L, System.currentTimeMillis())))
    }
    val names = fs.listStatus(d).map(_.getPath.getName).toSeq
    assert(names.exists(ScbfDiscovery.isFold), s"expected a fold in $names")
    assert(!fs.exists(stale), "the stale claim must be swept")
    // this round's own claims are fresh (within the hour) and survive
    assert(names.exists(_.startsWith("claim-")))
  }

  test("a sorted fold bisects: post-lo entries exact, pre-lo bytes skipped") {
    val dir = tmpDir("scbf-fold-bisect")
    val root = q(dir)
    // drive past the threshold so a fold exists, remembering each
    // commit's published stamp
    val n = ScbfDiscovery.CompactThreshold + 8
    (0 until n).foreach { i =>
      ScbfDiscovery.append(root, hconf, Seq(ScbfDiscovery.Entry(
        f"bz-$i%05d.scbf", 10L + i, System.currentTimeMillis())))
    }
    val chain = ScbfDiscovery.commitChain(root, hconf)
    val fold = chain.find(ScbfDiscovery.isFold).get
    assert(ScbfDiscovery.isSortedFold(fold), s"round-13 folds are sorted: $fold")
    // ground truth: the fold's full contents via the plain streamed read
    val all = scala.collection.mutable.ArrayBuffer.empty[ScbfDiscovery.Entry]
    ScbfDiscovery.readDeltaStream(root, hconf, fold)(all += _)
    assert(all.size >= ScbfDiscovery.CompactThreshold)
    assert(all.map(_.ts) == all.map(_.ts).sorted, "fold entries are ts-sorted")
    // bisect from several cut points, including extremes
    Seq(0, 1, all.size / 2, all.size - 1, all.size).foreach { k =>
      val lo = if (k == 0) all.head.ts - 1 else all(k - 1).ts
      val got = scala.collection.mutable.ArrayBuffer.empty[ScbfDiscovery.Entry]
      ScbfDiscovery.readSortedFoldFrom(root, hconf, fold, lo)(got += _)
      assert(got.map(_.name).toSeq == all.drop(k).map(_.name).toSeq,
        s"cut at $k: got ${got.size}, expected ${all.size - k}")
    }
    // and the full bounded replay (the feed's engine) agrees through
    // the bisect path: a window opened mid-fold serves the exact tail
    val k = all.size / 2
    val replayed = ScbfDiscovery.replayEntriesAfter(root, hconf, all(k - 1).ts,
      msg => throw new graft.scbf.ScbfFormatException(msg))
    assert(replayed.keySet ==
      (all.drop(k).map(_.name) ++
        chain.filterNot(ScbfDiscovery.isFold).flatMap(c =>
          ScbfDiscovery.readDelta(root, hconf, c).map(_.name))).toSet)
  }

  test("ordinary same-process commits still stamp distinct, ordered instants") {
    val dir = tmpDir("scbf-commit-plain")
    val root = q(dir)
    val now = System.currentTimeMillis()
    (0 until 5).foreach(i => ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry(s"p$i.scbf", 1L, now)))) // same wall instant
    val vts = (0 until 5).map(v => ScbfDiscovery.versionTs(root, hconf, v))
    assert(vts.distinct == vts && vts == vts.sorted, s"$vts")
  }
}
