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
