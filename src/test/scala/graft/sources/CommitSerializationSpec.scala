package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The ordinal-CAS commit protocol (round 15 — Delta's `N.json` shape):
 * a commit's ordinal IS its delta name (`delta-v<K>%010d`), published
 * by an atomic exclusive-create of the name itself, so
 *  - two processes racing one slot produce CONSECUTIVE ordinals and
 *    the loser RETRIES (restamps + republishes) without aborting its
 *    payload work — single-loser, no both-abort;
 *  - entry stamps follow the ordinal serialization order exactly (a
 *    CAS loser raises its clock past the winner's actual stamps
 *    before restamping) — the round-13 distinct-millisecond
 *    interleave residual is closed;
 *  - pre-round-15 (v1, millis+uuid) chains keep reading: 'v' sorts
 *    after every digit, so a mixed chain orders old-then-new with no
 *    migration step, and the next compaction folds it all into one
 *    span-recording v2 fold.
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
    // the ordinal IS the name: claimed ordinals are exactly 0..5, and
    // name sort order equals commit order
    val claimed = chain.map(c => ScbfDiscovery.claimedLast(c._1).get)
    assert(claimed == (0 until 6), s"claimed ordinals must be 0..5: $claimed")
    // per-version instants strictly increase (the time axis follows)
    val vts = (0 until 6).map(v => ScbfDiscovery.versionTs(root, hconf, v))
    assert(vts == vts.sorted && vts.distinct == vts,
      s"per-version instants must strictly increase: $vts")
    // and every delta has its publication-instant marker, ≥ its stamps
    val listing = ScbfDiscovery.listLog(root, hconf)
    chain.foreach { case (n, _, v) =>
      assert(listing.instants.contains(n), s"missing instant marker for $n")
      assert(listing.instants(n) >= ScbfDiscovery.versionTs(root, hconf, v))
    }
  }

  test("two processes racing one slot: consecutive ordinals, loser retries without aborting") {
    val dir = tmpDir("scbf-cas-race")
    val root = q(dir)
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("base.scbf", 1L, System.currentTimeMillis())))
    // loser thread computes its ordinal, then BLOCKS in the CAS window
    // while the winner (a "separate process": fresh clock) publishes
    // the same slot
    val loserInWindow = new java.util.concurrent.CountDownLatch(1)
    val winnerDone = new java.util.concurrent.CountDownLatch(1)
    val hookOn = new java.util.concurrent.atomic.AtomicBoolean(true)
    ScbfDiscovery.casRaceHook = () =>
      if (hookOn.getAndSet(false)) { // only the loser's FIRST attempt
        loserInWindow.countDown()
        winnerDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
    try {
      val loser = new Thread(() =>
        ScbfDiscovery.append(root, hconf, Seq(
          ScbfDiscovery.Entry("loser.scbf", 2L, System.currentTimeMillis()))))
      loser.start()
      assert(loserInWindow.await(30, java.util.concurrent.TimeUnit.SECONDS))
      ScbfDiscovery.resetCommitClocks() // the winner is a fresh process
      ScbfDiscovery.append(root, hconf, Seq(
        ScbfDiscovery.Entry("winner.scbf", 3L, System.currentTimeMillis())))
      winnerDone.countDown()
      loser.join(30000)
      assert(!loser.isAlive, "loser append must complete")
    } finally {
      ScbfDiscovery.casRaceHook = () => ()
    }
    // consecutive ordinals 0,1,2 — winner at 1 (it published slot 1
    // first), loser RETRIED into 2 with its payload intact
    val chain = ScbfDiscovery.versionedChain(root, hconf)
    assert(chain.map(_._3) == Seq(0, 1, 2), s"ordinals: $chain")
    val byVersion = chain.map { case (n, _, v) =>
      v -> ScbfDiscovery.readDelta(root, hconf, n).map(_.name) }.toMap
    assert(byVersion(1) == Seq("winner.scbf"))
    assert(byVersion(2) == Seq("loser.scbf"), "loser's payload must survive the retry")
    // the loser's restamp serialized the TIME axis behind the winner
    assert(ScbfDiscovery.versionTs(root, hconf, 2) >
      ScbfDiscovery.versionTs(root, hconf, 1))
  }

  test("concurrent appends from many threads: all published, contiguous ordinals") {
    val dir = tmpDir("scbf-cas-many")
    val root = q(dir)
    val n = 12
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until n).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            ScbfDiscovery.append(root, hconf, Seq(
              ScbfDiscovery.Entry(s"c$i.scbf", 1L + i, System.currentTimeMillis())))
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val chain = ScbfDiscovery.versionedChain(root, hconf)
    assert(chain.map(_._3) == (0 until n), s"ordinals must be contiguous: $chain")
    // every payload landed exactly once
    val all = chain.flatMap(c => ScbfDiscovery.readDelta(root, hconf, c._1))
    assert(all.map(_.name).sorted == (0 until n).map(i => s"c$i.scbf").sorted)
    // and the time axis is a total order agreeing with the ordinals
    val vts = (0 until n).map(v => ScbfDiscovery.versionTs(root, hconf, v))
    assert(vts == vts.sorted && vts.distinct == vts, s"$vts")
  }

  test("mixed chain: v1 deltas keep reading, new commits continue the numbering, compaction migrates") {
    val dir = tmpDir("scbf-cas-mixed")
    val root = q(dir)
    val d = ScbfDiscovery.dir(root)
    val fs = d.getFileSystem(hconf)
    fs.mkdirs(d)
    // hand-write two pre-round-15 (v1) deltas, the old name shape
    def v1(millis: Long, entry: String, ts: Long): Unit = {
      val name = f"delta-$millis%013d-${java.util.UUID.randomUUID().toString.take(8)}"
      val out = fs.create(new Path(d, name), false)
      try out.write(s"discovery\t1\n$entry\t5\t$ts".getBytes("UTF-8"))
      finally out.close()
    }
    v1(1700000000001L, "old0.scbf", 1700000000001L)
    v1(1700000000005L, "old1.scbf", 1700000000005L)
    // a new CAS commit continues the old numbering at ordinal 2
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("new2.scbf", 7L, System.currentTimeMillis())))
    val chain = ScbfDiscovery.versionedChain(root, hconf)
    assert(chain.map(_._3) == Seq(0, 1, 2), s"$chain")
    assert(ScbfDiscovery.claimedLast(chain.last._1).contains(2))
    val ts1 = ScbfDiscovery.versionTs(root, hconf, 1)
    // drive past the fold threshold: compaction folds the MIXED chain
    // into one span-recording v2 fold; ordinals and instants survive
    (3 to ScbfDiscovery.CompactThreshold + 2).foreach { i =>
      ScbfDiscovery.append(root, hconf,
        Seq(ScbfDiscovery.Entry(s"b$i.scbf", 1L, System.currentTimeMillis())))
    }
    val folded = ScbfDiscovery.commitChain(root, hconf)
    val fold = folded.find(ScbfDiscovery.isFold).get
    assert(ScbfDiscovery.claimedRange(fold).isDefined, s"v2 fold expected: $fold")
    assert(ScbfDiscovery.isSortedFold(fold))
    // the folded chain still renders the same total ordinal span and
    // the same per-version instant for the fold's interior-free points
    val total = ScbfDiscovery.versionedChain(root, hconf).last._3
    assert(total == ScbfDiscovery.CompactThreshold + 2, s"total=$total")
    // version 1's instant is folded away as a standalone delta, but
    // its entries' stamps survive verbatim through the fold — the
    // time axis (TIMESTAMP AS OF's basis) is unchanged
    assert(ts1 == 1700000000005L)
    val post = ScbfDiscovery.replayEntriesAfter(root, hconf, 0L,
      msg => throw new graft.scbf.ScbfFormatException(msg))
    assert(post.contains("old0.scbf") && post.contains("old1.scbf"))
    assert(post("old1.scbf").ts == 1700000000005L, "fold copies keep stamps verbatim")
  }

  test("subsumption: a fold and its covered deltas coexisting never double-count") {
    val dir = tmpDir("scbf-cas-subsume")
    val root = q(dir)
    val d = ScbfDiscovery.dir(root)
    val fs = d.getFileSystem(hconf)
    fs.mkdirs(d)
    def put(name: String, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(d, name), false)
      try out.write(("discovery\t1" +: lines).mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    // two plain v2 commits + a fold covering both (the transient
    // compaction window: fold published, covered deltas not yet
    // deleted). The fold's copy of a1 carries a scrub-style removal —
    // readers must trust the FOLD, not resurrect the covered delta.
    put("delta-v0000000000", Seq("a0.scbf\t5\t1700000000001"))
    put("delta-v0000000001", Seq("a1.scbf\t5\t1700000000002"))
    put("delta-v0000000001f0000000002s", Seq(
      "a0.scbf\t5\t1700000000001\tV:0"))
    val chain = ScbfDiscovery.versionedChain(root, hconf)
    assert(chain.size == 1 && chain.head._2 == 0 && chain.head._3 == 1,
      s"the fold subsumes both covered deltas: $chain")
    val replay = ScbfDiscovery.replayEntriesAfter(root, hconf, 0L,
      msg => throw new graft.scbf.ScbfFormatException(msg))
    assert(replay.keySet == Set("a0.scbf"),
      s"a scrubbed entry must not resurrect from a subsumed delta: ${replay.keySet}")
    // equal-range folds: the larger generation (the scrub rewrite) wins
    put("delta-v0000000001f0000000002s2", Seq(
      "a0.scbf\t5\t1700000000001\tV:0", "a1b.scbf\t5\t1700000000002\tV:1"))
    val chain2 = ScbfDiscovery.commitChain(root, hconf)
    assert(chain2 == Seq("delta-v0000000001f0000000002s2"), s"$chain2")
  }

  test("stale legacy claims and orphan markers sweep with compaction; live markers survive") {
    val dir = tmpDir("scbf-commit-sweep")
    val root = q(dir)
    ScbfDiscovery.append(root, hconf,
      Seq(ScbfDiscovery.Entry("a.scbf", 1L, System.currentTimeMillis())))
    val fs = root.getFileSystem(hconf)
    val d = ScbfDiscovery.dir(root)
    val staleClaim = new Path(d, f"claim-${1000L}%013d")
    fs.create(staleClaim, false).close()
    val orphanMarker = new Path(d, f"tsb-v9999999999-${1000L}%013d")
    fs.create(orphanMarker, false).close()
    // drive past the fold threshold — the fold's sweep removes both
    (0 to ScbfDiscovery.CompactThreshold).foreach { i =>
      ScbfDiscovery.append(root, hconf,
        Seq(ScbfDiscovery.Entry(s"b$i.scbf", 1L, System.currentTimeMillis())))
    }
    val names = fs.listStatus(d).map(_.getPath.getName).toSeq
    assert(names.exists(ScbfDiscovery.isFold), s"expected a fold in $names")
    assert(!fs.exists(staleClaim), "the stale legacy claim must be swept")
    assert(!fs.exists(orphanMarker), "the orphan marker must be swept")
    // live deltas keep their instant markers
    val listing = ScbfDiscovery.listLog(root, hconf)
    assert(listing.deltas.forall(listing.instants.contains),
      s"live deltas must keep instants: $listing")
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
    assert(ScbfDiscovery.isSortedFold(fold), s"v2 folds are sorted: $fold")
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
