package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * SHALLOW CLONE (ScbfClone + GraftShallowCloneCommand): zero-copy
 * experimentation branches. Creation is metadata cost (zero data-file
 * opens); reads resolve the refs length-guarded off the SOURCE's bytes
 * and sidecars; appends land in the clone's own directory; every
 * rewrite surface refuses with the CTAS guidance; a source rewrite
 * that removes referenced bytes turns into a LOUD dangling-ref refusal
 * on the clone — the documented VACUUM/DELETE interaction (VACUUM
 * itself never dangles a clone: it sweeps temps/orphans, never live
 * data).
 */
class CloneSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def fileSig(dir: String): Seq[(String, Long)] =
    ScbfDataSource.resolveFiles(Seq(dir), hconf)
      .map(f => (f.getPath.toString, f.getLen))

  test("clone = zero-copy branch: reads match, appends stay local, source byte-identical") {
    val src = tmpDir("scbf-clone-src")
    val cl = tmpDir("scbf-clone-dst") + "/c1"
    spark.sql("DROP TABLE IF EXISTS clone_src")
    spark.sql("DROP TABLE IF EXISTS clone_c1")
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    try {
      spark.sql(s"CREATE TABLE clone_src (id INT, v DOUBLE) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_src SELECT CAST(id AS INT), id * 0.5 FROM range(0, 500)")
      val sig0 = fileSig(src)
      ScbfUtil.dataFileOpens.set(0)
      val r = spark.sql(
        s"CREATE TABLE clone_c1 SHALLOW CLONE clone_src LOCATION '$cl'").head()
      assert(ScbfUtil.dataFileOpens.get == 0, "clone creation must open no data")
      assert(r.getInt(0) == sig0.size && r.getLong(1) == sig0.map(_._2).sum, r.toString)
      // full read parity, filters/pruning included
      assert(spark.table("clone_c1").count() == 500L)
      assert(spark.table("clone_c1").where($"id" < 100).agg(sum($"id")).head()
        == spark.table("clone_src").where($"id" < 100).agg(sum($"id")).head())
      // stats skipping rides the SOURCE sidecars: a narrow band on the
      // clone must not open out-of-band files
      val q = spark.table("clone_c1").where($"id" >= 0 && $"id" < 10)
      ScbfUtil.dataFileOpens.set(0)
      q.collect()
      assert(ScbfUtil.dataFileOpens.get < sig0.size,
        s"source-sidecar skipping must prune the clone read: opened " +
          s"${ScbfUtil.dataFileOpens.get} of ${sig0.size}")
      // appends land in the CLONE directory; the source is untouched
      spark.sql("INSERT INTO clone_c1 SELECT CAST(id AS INT), 1.0 FROM range(1000, 1100)")
      assert(spark.table("clone_c1").count() == 600L)
      assert(spark.table("clone_src").count() == 500L)
      assert(fileSig(src) == sig0, "source must stay byte-identical")
      // _file_path lineage points at the REAL bytes (source paths)
      val fp = spark.read.format("scbf").load(cl)
        .select(col("_file_path")).as[String].collect()
      assert(fp.exists(_.startsWith(new Path(src).getFileSystem(hconf)
        .makeQualified(new Path(src)).toString)), "refs must expose source lineage")
      // clone of a clone flattens through the refs
      val cl2 = tmpDir("scbf-clone-dst2") + "/c2"
      spark.sql("DROP TABLE IF EXISTS clone_c2")
      spark.sql(s"CREATE TABLE clone_c2 SHALLOW CLONE clone_c1 LOCATION '$cl2'")
      assert(spark.table("clone_c2").count() == 600L)
      spark.sql("DROP TABLE IF EXISTS clone_c2")
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_c1")
      spark.sql("DROP TABLE IF EXISTS clone_src")
    }
  }

  test("AS OF clones: TIMESTAMP and VERSION render the historical file set") {
    val src = tmpDir("scbf-clone-asof-src")
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    spark.sql("DROP TABLE IF EXISTS clone_asrc")
    spark.sql("DROP TABLE IF EXISTS clone_at")
    spark.sql("DROP TABLE IF EXISTS clone_av")
    try {
      spark.sql(s"CREATE TABLE clone_asrc (id INT) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_asrc SELECT CAST(id AS INT) FROM range(0, 100)")
      Thread.sleep(5)
      val t1 = System.currentTimeMillis()
      Thread.sleep(5)
      spark.sql("INSERT INTO clone_asrc SELECT CAST(id AS INT) FROM range(100, 300)")
      spark.sql(s"CREATE TABLE clone_at SHALLOW CLONE clone_asrc TIMESTAMP AS OF $t1 " +
        s"LOCATION '${tmpDir("scbf-clone-at")}/t'")
      assert(spark.table("clone_at").count() == 100L)
      spark.sql("CREATE TABLE clone_av SHALLOW CLONE clone_asrc VERSION AS OF 0 " +
        s"LOCATION '${tmpDir("scbf-clone-av")}/v'")
      assert(spark.table("clone_av").count() == 100L)
      // the branch is INDEPENDENT: more source appends don't move it
      spark.sql("INSERT INTO clone_asrc SELECT CAST(id AS INT) FROM range(300, 350)")
      assert(spark.table("clone_at").count() == 100L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_at")
      spark.sql("DROP TABLE IF EXISTS clone_av")
      spark.sql("DROP TABLE IF EXISTS clone_asrc")
    }
  }

  test("a clone is a streamable branch: refs at baseline, clone appends flow, source appends don't") {
    val src = tmpDir("scbf-clone-stream-src")
    val cl = tmpDir("scbf-clone-stream") + "/c"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    spark.sql("DROP TABLE IF EXISTS clone_ssrc")
    spark.sql("DROP TABLE IF EXISTS clone_sc")
    try {
      spark.sql(s"CREATE TABLE clone_ssrc (id INT) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_ssrc SELECT CAST(id AS INT) FROM range(0, 60)")
      spark.sql(s"CREATE TABLE clone_sc SHALLOW CLONE clone_ssrc LOCATION '$cl'")
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      val q = spark.readStream.format("scbf").schema("id INT").load(cl)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val ids = df.select(col("id")).collect().map(_.getInt(0)).toSeq
            seen.synchronized { seen += ids }
            ()
        }.start()
      try {
        // baseline listing resolves the refs — the branch's frozen view
        q.processAllAvailable()
        assert(seen.flatten.sorted == (0 until 60), s"baseline: $seen")
        // appends to the CLONE flow incrementally (its own discovery log)
        spark.sql("INSERT INTO clone_sc VALUES (1000)")
        q.processAllAvailable()
        assert(seen.flatten.sorted == ((0 until 60) :+ 1000), s"clone append: $seen")
        // appends to the SOURCE never reach the branch
        spark.sql("INSERT INTO clone_ssrc VALUES (2000)")
        q.processAllAvailable()
        assert(!seen.flatten.contains(2000),
          s"a source append leaked into the clone stream: $seen")
      } finally q.stop()
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_sc")
      spark.sql("DROP TABLE IF EXISTS clone_ssrc")
    }
  }

  test("CREATE OR REPLACE SHALLOW CLONE re-points the branch; real tables refuse") {
    val src = tmpDir("scbf-clone-repl-src")
    val cl = tmpDir("scbf-clone-repl") + "/c"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    spark.sql("DROP TABLE IF EXISTS clone_rsrc")
    spark.sql("DROP TABLE IF EXISTS clone_rc")
    try {
      spark.sql(s"CREATE TABLE clone_rsrc (id INT) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_rsrc SELECT CAST(id AS INT) FROM range(0, 100)")
      spark.sql(s"CREATE TABLE clone_rc SHALLOW CLONE clone_rsrc LOCATION '$cl'")
      spark.sql("INSERT INTO clone_rc VALUES (9999)") // local branch work
      spark.sql("INSERT INTO clone_rsrc SELECT CAST(id AS INT) FROM range(100, 300)")
      assert(spark.table("clone_rc").count() == 101L)
      // plain CREATE over the existing clone refuses, naming the cure
      val e0 = intercept[Exception] {
        spark.sql(s"CREATE TABLE clone_rc SHALLOW CLONE clone_rsrc LOCATION '$cl'")
      }
      assert(e0.getMessage.contains("OR REPLACE"), e0.getMessage)
      // REPLACE re-points the branch at the source's CURRENT state and
      // drops the old branch whole — local appends included (REPLACE
      // semantics, documented loudly)
      spark.sql("CREATE OR REPLACE TABLE clone_rc SHALLOW CLONE clone_rsrc")
      assert(spark.table("clone_rc").count() == 300L)
      assert(spark.table("clone_rc").where("id = 9999").count() == 0L,
        "REPLACE must drop the old branch's local appends")
      // …and it is the one-statement cure for a dangling branch
      spark.sql("DELETE FROM clone_rsrc WHERE id < 50")
      intercept[Exception](spark.table("clone_rc").count()) // dangled
      spark.sql("CREATE OR REPLACE TABLE clone_rc SHALLOW CLONE clone_rsrc")
      assert(spark.table("clone_rc").count() == 250L)
      // a REAL table never gets silently replaced by a ref list
      val eReal = intercept[Exception] {
        spark.sql("CREATE OR REPLACE TABLE clone_rsrc SHALLOW CLONE clone_rc")
      }
      assert(eReal.getMessage.contains("NOT a shallow clone"), eReal.getMessage)
      assert(spark.table("clone_rsrc").count() == 250L, "refusal must not mutate")
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_rc")
      spark.sql("DROP TABLE IF EXISTS clone_rsrc")
    }
  }

  test("partitioned clones are partition-grade: pruned refs, rollup pushdown, zero-shuffle SPJ") {
    val src = tmpDir("scbf-clone-part-src")
    val cl1 = tmpDir("scbf-clone-part") + "/c1"
    val cl2 = tmpDir("scbf-clone-part") + "/c2"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    Seq("clone_psrc", "clone_pc1", "clone_pc2")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      spark.sql("CREATE TABLE clone_psrc (id INT, n INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$src'")
      // two waves → every partition holds MULTIPLE files
      (0 until 2).foreach { w =>
        spark.sql("INSERT INTO clone_psrc SELECT CAST(id AS INT), " +
          s"CAST(id * 7 + $w AS INT), concat('g', CAST(id % 4 AS INT)) " +
          s"FROM range(${w * 100}, ${w * 100 + 100})")
      }
      spark.sql(s"CREATE TABLE clone_pc1 SHALLOW CLONE clone_psrc LOCATION '$cl1'")
      val refsAll = ScbfDataSource.resolveFiles(Seq(src), hconf)
      val refsG1 = refsAll.count(_.getPath.toString.contains("grp=g1"))
      assert(refsAll.size > refsG1 && refsG1 >= 2, s"fixture: $refsAll")
      // partition-pruned branch read: only g1's refs are ever STAT'ed
      // (pure path arithmetic on the ref list — the branch-side
      // rendering of directory pruning), only g1's files opened, and
      // no source partition directory is ever LISTED
      ScbfClone.refStats.set(0)
      ScbfPartitions.listedDirs.clear()
      ScbfUtil.dataFileOpens.set(0)
      val got = spark.table("clone_pc1").where($"grp" === "g1")
        .agg(sum($"n")).head().getLong(0)
      val branchOpens = ScbfUtil.dataFileOpens.get
      val branchStats = ScbfClone.refStats.get
      import scala.jdk.CollectionConverters._
      val listedSrcParts = ScbfPartitions.listedDirs.asScala
        .filter(d => d.startsWith(new Path(src).getFileSystem(hconf)
          .makeQualified(new Path(src)).toString) && d.contains("grp=")).toSeq
      val want = spark.table("clone_psrc").where($"grp" === "g1")
        .agg(sum($"n")).head().getLong(0)
      assert(got == want, s"pruned branch read parity: $got != $want")
      assert(branchStats == refsG1,
        s"a grp=g1 read must stat ONLY g1's refs: $branchStats != $refsG1")
      assert(branchOpens == refsG1, s"opened $branchOpens of $refsG1")
      assert(listedSrcParts.isEmpty,
        s"branch pruning is path arithmetic — no source partition listing: $listedSrcParts")
      // partition-rollup aggregate pushdown serves the BRANCH from the
      // source's dirsum head-reads: zero data opens, one row per grp
      ScbfUtil.dataFileOpens.set(0)
      val roll = spark.table("clone_pc1").groupBy($"grp")
        .agg(count(lit(1)).as("cnt"), sum($"n").as("s"))
      assert(roll.queryExecution.executedPlan.toString.contains("PushedAggregation") ||
        roll.queryExecution.optimizedPlan.toString.contains("count"), "plan sanity")
      val rows = roll.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ScbfUtil.dataFileOpens.get == 0,
        s"branch rollup must be metadata-only, opened ${ScbfUtil.dataFileOpens.get}")
      val wantRows = spark.table("clone_psrc").groupBy($"grp")
        .agg(count(lit(1)).as("cnt"), sum($"n").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq == wantRows.toSeq, s"${rows.toSeq} != ${wantRows.toSeq}")
      // SPJ: two branches of the co-partitioned source join on the
      // partition column with ZERO shuffle (keys inferred from the
      // refs' source-rooted cells; broadcast disabled so the plan
      // can't dodge the assertion)
      spark.sql(s"CREATE TABLE clone_pc2 SHALLOW CLONE clone_psrc LOCATION '$cl2'")
      val olds = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("clone_pc1").groupBy($"grp").agg(sum($"n").as("a"))
          .join(spark.table("clone_pc2").groupBy($"grp").agg(count(lit(1)).as("b")), "grp")
        val cnt = j.collect().length
        assert(cnt == 4, s"4 grp rows, got $cnt")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-partitioned BRANCH join must not shuffle:\n$plan")
      } finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      // a LOCAL append is PARTITION-GROUPED (round 12): the branch's
      // catalog entry carries the source's identity partitioning, so
      // the insert routes into a k=v subdirectory of the clone root —
      // pruning, the rollup fast path and SPJ survive an appended-to
      // branch
      spark.sql("INSERT INTO clone_pc1 VALUES (9999, 1, 'g1')")
      assert(spark.table("clone_pc1").where($"grp" === "g1").count() ==
        spark.table("clone_psrc").where($"grp" === "g1").count() + 1)
      val qcl1 = new Path(cl1).getFileSystem(hconf)
        .makeQualified(new Path(cl1)).toString
      val local = ScbfDataSource.resolveFiles(Seq(cl1), hconf)
        .filter(_.getPath.toString.startsWith(qcl1))
      assert(local.nonEmpty && local.forall(
          _.getPath.toString.contains("grp=g1")),
        s"branch appends must land under the clone's k=v layout: " +
          s"${local.map(_.getPath)}")
      // the pruned branch read still stats ONLY g1's refs and plans the
      // local file alongside them
      ScbfClone.refStats.set(0)
      val gotApp = spark.table("clone_pc1").where($"grp" === "g1")
        .agg(sum($"n")).head().getLong(0)
      assert(gotApp == want + 1, s"appended branch parity: $gotApp")
      assert(ScbfClone.refStats.get == refsG1,
        s"append must not widen the ref scope: ${ScbfClone.refStats.get}")
      // SPJ still holds: the local file's cells parse under the CLONE
      // root (both roots are partition roots for the branch scan)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j2 = spark.table("clone_pc1").groupBy($"grp").agg(sum($"n").as("a"))
          .join(spark.table("clone_pc2").groupBy($"grp").agg(count(lit(1)).as("b")), "grp")
        assert(j2.collect().length == 4)
        val plan2 = j2.queryExecution.executedPlan.toString
        assert(!plan2.contains("Exchange"),
          s"SPJ must survive a partition-grouped branch append:\n$plan2")
      } finally Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
      // partition MANAGEMENT stays a source-table operation: the
      // branch's partitions live in the source (refs), so managing the
      // local tree alone would half-drop or under-report — refused
      val ePm = intercept[Exception] {
        spark.sql("ALTER TABLE clone_pc1 DROP PARTITION (grp='g1')")
      }
      val mPm = Iterator.iterate(ePm: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(mPm.contains("SHALLOW CLONE"), mPm)
      // SHOW PARTITIONS refuses too: the local tree alone would omit
      // every ref-only partition (silently wrong > loudly refused)
      val eSp = intercept[Exception] { spark.sql("SHOW PARTITIONS clone_pc1").collect() }
      val mSp = Iterator.iterate(eSp: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(mSp.contains("SHALLOW CLONE"), mSp)
    } finally Seq("clone_pc1", "clone_pc2", "clone_psrc")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("clone-create racing source mutations: valid branch or loud dangling refusal, never torn") {
    val src = tmpDir("scbf-clone-race-src")
    val cl = tmpDir("scbf-clone-race") + "/c"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    Seq("clone_xsrc", "clone_xc").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val cloneCmd = graft.plans.GraftShallowCloneCommand
    try {
      spark.sql("CREATE TABLE clone_xsrc (id INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$src'")
      spark.sql("INSERT INTO clone_xsrc SELECT CAST(id AS INT), " +
        "concat('g', CAST(id % 2 AS INT)) FROM range(0, 100)")
      // interleaving A: a whole-partition DELETE lands between the
      // source listing and the ref-file publish — the create SUCCEEDS
      // (the ref list is a snapshot of the captured listing) and the
      // FIRST READ refuses with the dangling-ref contract naming the
      // CREATE OR REPLACE cure; the ref file itself is never torn
      cloneCmd.raceHook =
        () => spark.sql("DELETE FROM clone_xsrc WHERE grp = 'g0'")
      try spark.sql(s"CREATE TABLE clone_xc SHALLOW CLONE clone_xsrc LOCATION '$cl'")
      finally cloneCmd.raceHook = () => ()
      val meta = ScbfClone.read(new Path(cl), hconf)
      assert(meta.exists(_.refs.nonEmpty), "ref file must be whole, never torn")
      val e1 = intercept[Exception](spark.table("clone_xc").count())
      val m1 = Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(m1.contains("no longer exists") && m1.contains("Re-create the clone"), m1)
      // the cure works and lands on the post-mutation state
      spark.sql("CREATE OR REPLACE TABLE clone_xc SHALLOW CLONE clone_xsrc")
      assert(spark.table("clone_xc").count() ==
        spark.table("clone_xsrc").count())
      // interleaving B: OPTIMIZE rewrites the referenced bytes
      // mid-create — same contract (create succeeds; read refuses
      // loudly; REPLACE cures). Re-seed multi-file partitions first so
      // OPTIMIZE has something to fold.
      spark.sql("INSERT INTO clone_xsrc SELECT CAST(id AS INT), " +
        "concat('g', CAST(id % 2 AS INT)) FROM range(100, 200)")
      spark.sql("DROP TABLE IF EXISTS clone_xc")
      new Path(cl).getFileSystem(hconf).delete(new Path(cl), true)
      cloneCmd.raceHook = () => spark.sql("OPTIMIZE clone_xsrc")
      try spark.sql(s"CREATE TABLE clone_xc SHALLOW CLONE clone_xsrc LOCATION '$cl'")
      finally cloneCmd.raceHook = () => ()
      assert(ScbfClone.read(new Path(cl), hconf).exists(_.refs.nonEmpty))
      val e2 = intercept[Exception](spark.table("clone_xc").count())
      val m2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(m2.contains("shallow clone") &&
        (m2.contains("no longer exists") || m2.contains("changed length")), m2)
      spark.sql("CREATE OR REPLACE TABLE clone_xc SHALLOW CLONE clone_xsrc")
      assert(spark.table("clone_xc").count() ==
        spark.table("clone_xsrc").count())
    } finally {
      cloneCmd.raceHook = () => ()
      Seq("clone_xc", "clone_xsrc").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("REPLACE is staged: a ref-write failure restores the original branch") {
    val src = tmpDir("scbf-clone-stage-src")
    val cl = tmpDir("scbf-clone-stage") + "/c"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    Seq("clone_stsrc", "clone_stc").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val cloneCmd = graft.plans.GraftShallowCloneCommand
    try {
      spark.sql(s"CREATE TABLE clone_stsrc (id INT) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_stsrc SELECT CAST(id AS INT) FROM range(0, 50)")
      spark.sql(s"CREATE TABLE clone_stc SHALLOW CLONE clone_stsrc LOCATION '$cl'")
      spark.sql("INSERT INTO clone_stc VALUES (777)") // branch-local work
      assert(spark.table("clone_stc").count() == 51L)
      // crash INSIDE the publish window (after the old branch was set
      // aside, before the new ref file lands) — the staged design's
      // whole point: the original branch must come back whole
      cloneCmd.replacePublishHook =
        () => throw new RuntimeException("simulated publish crash")
      val e = intercept[Exception] {
        spark.sql("CREATE OR REPLACE TABLE clone_stc SHALLOW CLONE clone_stsrc")
      }
      cloneCmd.replacePublishHook = () => ()
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(_.contains("simulated publish crash"))),
        e.getMessage)
      // the original branch is back: same table, same rows, local
      // append included — REPLACE never destroys before publishing
      assert(spark.table("clone_stc").count() == 51L,
        "failed REPLACE must restore the original branch")
      assert(spark.table("clone_stc").where($"id" === 777).count() == 1L)
      // and the table is still replaceable (no parked-litter brick)
      spark.sql("CREATE OR REPLACE TABLE clone_stc SHALLOW CLONE clone_stsrc")
      assert(spark.table("clone_stc").count() == 50L)
    } finally {
      cloneCmd.raceHook = () => ()
      cloneCmd.replacePublishHook = () => ()
      Seq("clone_stc", "clone_stsrc").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("rewrite surfaces refuse on a clone; VACUUM on the source never dangles it") {
    val src = tmpDir("scbf-clone-guard-src")
    val cl = tmpDir("scbf-clone-guard") + "/c"
    new Path(src).getFileSystem(hconf).delete(new Path(src), true)
    spark.sql("DROP TABLE IF EXISTS clone_gsrc")
    spark.sql("DROP TABLE IF EXISTS clone_gc")
    try {
      spark.sql(s"CREATE TABLE clone_gsrc (id INT, v DOUBLE) USING scbf LOCATION '$src'")
      spark.sql("INSERT INTO clone_gsrc SELECT CAST(id AS INT), 0.5 FROM range(0, 200)")
      spark.sql(s"CREATE TABLE clone_gc SHALLOW CLONE clone_gsrc LOCATION '$cl'")
      def refuses(sql: String, tag: String): Unit = {
        val e = intercept[Exception](spark.sql(sql).collect())
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        assert(msgs.contains("SHALLOW CLONE"), s"$tag: $msgs")
      }
      refuses("DELETE FROM clone_gc WHERE id < 10", "DELETE")
      refuses("UPDATE clone_gc SET v = 1.0 WHERE id < 10", "UPDATE")
      refuses("OPTIMIZE clone_gc", "OPTIMIZE")
      refuses("OPTIMIZE clone_gc CLUSTER BY (id)", "OPTIMIZE CLUSTER")
      refuses("INSERT OVERWRITE clone_gc SELECT CAST(id AS INT), 2.0 FROM range(0, 5)",
        "INSERT OVERWRITE")
      refuses(s"RESTORE TABLE clone_gc TO TIMESTAMP AS OF ${System.currentTimeMillis()}",
        "RESTORE")
      refuses("ALTER TABLE clone_gc ADD COLUMN flag INT DEFAULT 0", "ADD COLUMN")
      // and the clone still reads fine after every refusal
      assert(spark.table("clone_gc").count() == 200L)
      // history/time-travel guidance is clone-aware, not the generic
      // no-log / bypassed-producer refusals
      val eh = intercept[Exception](spark.sql("DESCRIBE HISTORY clone_gc").collect())
      assert(eh.getMessage.contains("branch point"), eh.getMessage)
      val et = intercept[Exception] {
        spark.read.format("scbf")
          .option("asOfTimestamp", System.currentTimeMillis())
          .load(cl).count()
      }
      val etMsgs = Iterator.iterate(et: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(etMsgs.contains("frozen rendering"), etMsgs)
      // VACUUM on the source sweeps litter only — the clone survives
      spark.sql("VACUUM clone_gsrc RETAIN 0 HOURS")
      assert(spark.table("clone_gc").count() == 200L)
      // a source DELETE physically rewrites referenced bytes → the
      // clone read refuses LOUDLY with the dangling-ref contract
      spark.sql("DELETE FROM clone_gsrc WHERE id < 100")
      val e = intercept[Exception](spark.table("clone_gc").count())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("shallow clone") &&
        (msgs.contains("no longer exists") || msgs.contains("changed length")),
        msgs)
      // a torn/corrupt ref file REFUSES (refs ARE the data — unlike
      // best-effort stats, a half-read list would be a silently
      // partial table)
      val refP = ScbfClone.refPath(new Path(cl))
      val rfs = refP.getFileSystem(hconf)
      val out = rfs.create(refP, true)
      out.write("garbage\nnot-a-clone-file".getBytes("UTF-8")); out.close()
      val ec = intercept[Exception](spark.table("clone_gc").count())
      val ecMsgs = Iterator.iterate(ec: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(ecMsgs.contains("unreadable"), ecMsgs)
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_gc")
      spark.sql("DROP TABLE IF EXISTS clone_gsrc")
    }
  }
}
