package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Row-level CHANGE DATA CAPTURE (ScbfCdc): mutations on a CDC-enabled
 * table retain their victims (zero-copy rename) and materialize
 * change rows, and [[ScbfCdc.changes]] enumerates a window's changes
 * as rows tagged `_change_type` — the consumer shape the netting feed
 * gates on. Contracts under test:
 *  - whole-file DELETE enumerates its removed rows straight from the
 *    retained bytes (the zero-IO takedown stays zero-IO);
 *  - partial DELETE / API UPDATE materialize EXACT rows (update_pre/
 *    update_post pair);
 *  - SQL COW UPDATE / MERGE / subquery DELETE enumerate value-level
 *    deltas (the ReplaceData marker is projected away — documented);
 *  - CDC is a change LOG: in-window add+delete emits BOTH;
 *  - uncaptured mutations and swept retention refuse loudly, naming
 *    the cure;
 *  - TIMESTAMP AS OF stays exact ACROSS captured rewrites (retention
 *    recovery in filesAsOf);
 *  - OPTIMIZE retains but enumerates nothing; in-window adds stay
 *    enumerable through a later compaction;
 *  - INSERT OVERWRITE PARTITION enumerates as delete + insert;
 *  - TBLPROPERTIES('cdc'='true') is the SQL spelling of enable().
 */
class CdcSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def tick(): Long = { Thread.sleep(5); System.currentTimeMillis() }

  private def qroot(dir: String): Path = {
    val p = new Path(dir)
    p.getFileSystem(hconf).makeQualified(p)
  }

  private def writeWave(dir: String, from: Int, until: Int): Unit =
    (from until until).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def enable(dir: String): Unit = ScbfCdc.enable(new Path(dir), hconf)

  private def changes(dir: String, since: Long, until: Option[Long] = None) =
    ScbfCdc.changes(spark, dir, since = Some(since), until = until)

  /** (id, v, change_type) triples, sorted. */
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, String)] =
    df.select($"id", $"v", col(ScbfCdc.ChangeTypeCol)).as[(Int, Int, String)]
      .collect().toSeq.sorted

  test("whole-file DELETE enumerates removed rows from retained bytes") {
    val dir = tmpDir("scbf-cdc-whole")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_whole")
    spark.sql(s"CREATE TABLE cdc_whole (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)    // one file, ids 0..99 — provably all-match
    writeWave(dir, 100, 200)
    val t1 = tick()
    writeWave(dir, 200, 300)
    spark.sql("DELETE FROM cdc_whole WHERE id < 100")
    // the victim's bytes moved (zero-copy), not copied: gone from the
    // table, present under .scbf.cdc
    val live = ScbfDataSource.resolveFiles(Seq(dir), hconf)
    assert(live.size == 2, s"victim file must leave the table: $live")
    val fs = qroot(dir).getFileSystem(hconf)
    val cdcFiles = fs.listStatus(ScbfCdc.dir(qroot(dir))).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(cdcFiles.exists(_.startsWith("delete-")), s"tag dir: $cdcFiles")
    // window over the delete: wave-3 inserts + wave-1 deletes; the
    // PRE-window rows' removal is enumerated (the netting feed GATES
    // on exactly this shape)
    val got = rows(changes(dir, t1))
    val expected =
      (200 until 300).map(i => (i, i * 10, "insert")) ++
        (0 until 100).map(i => (i, i * 10, "delete"))
    assert(got == expected.sorted)
    // commit instants: deletes carry a later commit than the inserts
    val ts = changes(dir, t1)
      .select(col(ScbfCdc.ChangeTypeCol), col(ScbfCdc.CommitTsCol))
      .distinct().as[(String, java.sql.Timestamp)].collect().toMap
    assert(ts("delete").after(ts("insert")))
  }

  test("partial DELETE materializes exact delete rows") {
    val dir = tmpDir("scbf-cdc-partial")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_partial")
    spark.sql(s"CREATE TABLE cdc_partial (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    spark.sql("DELETE FROM cdc_partial WHERE id % 10 = 3") // no file is all-match
    val got = rows(changes(dir, t1))
    assert(got == (0 until 100).filter(_ % 10 == 3)
      .map(i => (i, i * 10, "delete")).sorted)
    // survivors are untouched by the enumeration
    assert(spark.sql("SELECT COUNT(*) FROM cdc_partial").head().getLong(0) == 90L)
  }

  test("API UPDATE captures exact update_pre/update_post pairs") {
    val dir = tmpDir("scbf-cdc-upd")
    enable(dir)
    writeWave(dir, 0, 100)
    val t1 = tick()
    ScbfDelete.updateWhere(spark, dir, hconf,
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 90)),
      Map("v" -> (col("v") + 1)))
    val got = rows(changes(dir, t1))
    val expected =
      (90 until 100).map(i => (i, i * 10, "update_pre")) ++
        (90 until 100).map(i => (i, i * 10 + 1, "update_post"))
    assert(got == expected.sorted)
  }

  test("SQL COW UPDATE and MERGE enumerate value-level deltas") {
    val dir = tmpDir("scbf-cdc-cow")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_cow")
    spark.sql(s"CREATE TABLE cdc_cow (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    spark.sql("UPDATE cdc_cow SET v = v + 5 WHERE id < 10")
    val gotU = rows(changes(dir, t1))
    val expU =
      (0 until 10).map(i => (i, i * 10, "update_pre")) ++
        (0 until 10).map(i => (i, i * 10 + 5, "update_post"))
    assert(gotU == expU.sorted)
    // MERGE: matched-even update, matched-odd delete, not-matched insert
    val t2 = tick()
    (95 until 105).map(i => (i, -1)).toDF("mid", "mv")
      .createOrReplaceTempView("cdc_cow_src")
    spark.sql("""MERGE INTO cdc_cow USING cdc_cow_src ON cdc_cow.id = mid
      WHEN MATCHED AND mid % 2 = 0 THEN UPDATE SET v = 7
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (mid, 1)""")
    val gotM = rows(changes(dir, t2))
    // merge semantics, documented: delete+insert value pairs — an
    // updated row contributes its pre-image as delete, post as insert
    val expM =
      (95 until 100).map(i => (i, i * 10, "delete")) ++
        (95 until 100).filter(_ % 2 == 0).map(i => (i, 7, "insert")) ++
        (100 until 105).map(i => (i, 1, "insert"))
    assert(gotM == expM.sorted)
  }

  test("subquery DELETE (copy-on-write) enumerates its removed rows") {
    val dir = tmpDir("scbf-cdc-subq")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_subq")
    spark.sql(s"CREATE TABLE cdc_subq (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    Seq(5, 15, 25).toDF("k").createOrReplaceTempView("cdc_subq_src")
    spark.sql("DELETE FROM cdc_subq WHERE id IN (SELECT k FROM cdc_subq_src)")
    assert(rows(changes(dir, t1)) ==
      Seq(5, 15, 25).map(i => (i, i * 10, "delete")).sorted)
  }

  test("CDC is a change log: in-window add then delete emits both") {
    val dir = tmpDir("scbf-cdc-log")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_log")
    spark.sql(s"CREATE TABLE cdc_log (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 50)
    val t1 = tick()
    writeWave(dir, 1000, 1010)
    spark.sql("DELETE FROM cdc_log WHERE id >= 1000")
    val got = rows(changes(dir, t1))
    val expected =
      (1000 until 1010).map(i => (i, i * 10, "insert")) ++
        (1000 until 1010).map(i => (i, i * 10, "delete"))
    assert(got == expected.sorted, "the netting feed nets this to zero; CDC must not")
  }

  test("uncaptured mutations and swept retention refuse, naming the cure") {
    val dir = tmpDir("scbf-cdc-off")
    spark.sql("DROP TABLE IF EXISTS cdc_off")
    spark.sql(s"CREATE TABLE cdc_off (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    spark.sql("DELETE FROM cdc_off WHERE id < 10") // CDC off: no capture
    val e = intercept[graft.scbf.ScbfFormatException](changes(dir, t1).collect())
    assert(e.getMessage.contains("without CDC capture") &&
      e.getMessage.contains("ScbfCdc.enable"), e.getMessage)
    // swept retention: enable, capture, vacuum everything → loud refusal
    val dir2 = tmpDir("scbf-cdc-swept")
    enable(dir2)
    spark.sql("DROP TABLE IF EXISTS cdc_swept")
    spark.sql(s"CREATE TABLE cdc_swept (id INT, v INT) USING scbf LOCATION '$dir2'")
    writeWave(dir2, 0, 100)
    val t2 = tick()
    spark.sql("DELETE FROM cdc_swept WHERE id < 100")
    assert(changes(dir2, t2).count() == 100L)
    assert(ScbfCdc.vacuum(new Path(dir2), hconf, 0L) >= 1)
    val e2 = intercept[graft.scbf.ScbfFormatException](changes(dir2, t2).collect())
    assert(e2.getMessage.contains("resync"), e2.getMessage)
  }

  test("TIMESTAMP AS OF stays exact across a captured delete") {
    val dir = tmpDir("scbf-cdc-asof")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_asof")
    spark.sql(s"CREATE TABLE cdc_asof (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    spark.sql("DELETE FROM cdc_asof WHERE id < 100") // whole table, retained
    // without retention this refuses ("physically removed"); with it,
    // the pre-delete rendering serves from the CDC area, exactly
    val old = spark.read.format("scbf").option("asOfTimestamp", t1).load(dir)
    assert(old.select($"id").as[Int].collect().toSeq.sorted == (0 until 100))
    // stats sidecars moved with the bytes: a pruned read stays pruned
    assert(old.filter($"id" === 5).count() == 1L)
  }

  test("OPTIMIZE retains but enumerates nothing; adds survive compaction") {
    val dir = tmpDir("scbf-cdc-opt")
    enable(dir)
    writeWave(dir, 0, 50)
    val t1 = tick()
    writeWave(dir, 50, 100)
    writeWave(dir, 100, 150)
    // compaction folds ALL files (waves 2+3 included) into one
    ScbfMaintenance.compact(spark, dir, 1)
    assert(ScbfDataSource.resolveFiles(Seq(dir), hconf).size == 1)
    // the window's adds are enumerable even though their files are
    // gone — served from the compaction's retention; the compaction
    // itself contributes NO rows (rows unchanged)
    val got = rows(changes(dir, t1))
    assert(got == (50 until 150).map(i => (i, i * 10, "insert")).sorted)
  }

  test("partitioned table-level OPTIMIZE retains per partition; window adds survive") {
    val dir = tmpDir("scbf-cdc-popt")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_popt")
    spark.sql(s"CREATE TABLE cdc_popt (id INT, v INT, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    spark.sql("INSERT INTO cdc_popt SELECT CAST(id AS INT), CAST(id AS INT), " +
      "concat('g', CAST(id % 2 AS INT)) FROM range(40)")
    val t1 = tick()
    spark.sql("INSERT INTO cdc_popt SELECT CAST(id AS INT), CAST(id AS INT), " +
      "concat('g', CAST(id % 2 AS INT)) FROM range(40, 80)")
    // table-level compaction folds BOTH waves per partition; the sweep
    // threads one tag per partition commit and re-announces it to the
    // ROOT log, so the window's adds resolve from root-tagged retention
    ScbfMaintenance.compactTable(spark, dir, 1)
    val got = changes(dir, t1)
      .select($"id", col(ScbfCdc.ChangeTypeCol)).as[(Int, String)]
      .collect().toSeq.sorted
    // exactly the window's adds, all tagged insert — which also pins
    // that the compaction itself enumerated nothing (rows unchanged)
    assert(got == (40 until 80).map(i => (i, "insert")).sorted,
      s"in-window adds must survive a partitioned compaction: $got")
  }

  test("INSERT OVERWRITE PARTITION enumerates as delete + insert") {
    val dir = tmpDir("scbf-cdc-owp")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_owp")
    spark.sql(s"CREATE TABLE cdc_owp (id INT, v INT, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    spark.sql("INSERT INTO cdc_owp SELECT CAST(id AS INT), CAST(id AS INT), " +
      "CASE WHEN id < 50 THEN 'a' ELSE 'b' END FROM range(100)")
    val t1 = tick()
    spark.sql("INSERT OVERWRITE cdc_owp PARTITION (grp='a') " +
      "SELECT CAST(id + 1000 AS INT), CAST(7 AS INT) FROM range(5)")
    val got = changes(dir, t1)
      .select($"id", col(ScbfCdc.ChangeTypeCol)).as[(Int, String)]
      .collect().toSeq.sorted
    val expected =
      (0 until 50).map(i => (i, "delete")) ++
        (1000 until 1005).map(i => (i, "insert"))
    assert(got == expected.sorted)
  }

  test("partitioned API takedown enumerates across partitions") {
    val dir = tmpDir("scbf-cdc-ptd")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_ptd")
    spark.sql(s"CREATE TABLE cdc_ptd (id INT, v INT, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    spark.sql("INSERT INTO cdc_ptd SELECT CAST(id AS INT), CAST(id AS INT), " +
      "concat('g', CAST(id % 3 AS INT)) FROM range(90)")
    val t1 = tick()
    // crosses every partition: partial in each
    spark.sql("DELETE FROM cdc_ptd WHERE id < 10")
    val got = changes(dir, t1)
      .select($"id", col(ScbfCdc.ChangeTypeCol)).as[(Int, String)]
      .collect().toSeq.sorted
    assert(got == (0 until 10).map(i => (i, "delete")).sorted)
  }

  test("TBLPROPERTIES('cdc'='true') is the SQL spelling of enable") {
    val dir = tmpDir("scbf-cdc-props")
    spark.sql("DROP TABLE IF EXISTS cdc_props")
    spark.sql(s"CREATE TABLE cdc_props (id INT, v INT) USING scbf " +
      s"LOCATION '$dir' TBLPROPERTIES ('cdc'='true')")
    // the property rides the CATALOG table: the first catalog-routed
    // mutation-capable statement materializes the marker (a PATH write
    // carries only its own options, not TBLPROPERTIES)
    spark.sql("INSERT INTO cdc_props SELECT CAST(id AS INT), " +
      "CAST(id * 10 AS INT) FROM range(100)")
    assert(ScbfCdc.enabled(new Path(dir), hconf))
    val t1 = tick()
    spark.sql("DELETE FROM cdc_props WHERE id < 100")
    assert(changes(dir, t1).count() == 100L)
  }

  test("SQL spelling: CREATE TEMP VIEW ... AS TABLE CHANGES tbl SINCE p") {
    val dir = tmpDir("scbf-cdc-sql")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_sql")
    spark.sql(s"CREATE TABLE cdc_sql (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)   // version 0
    writeWave(dir, 100, 150) // version 1
    spark.sql("DELETE FROM cdc_sql WHERE id < 50") // version 2, captured
    // version spelling: exclusive SINCE VERSION 0 = commits 1..
    val out = spark.sql(
      "CREATE TEMP VIEW cdc_sql_v AS TABLE CHANGES cdc_sql SINCE VERSION 0")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("cdc_sql_v"))
    val got = spark.sql(
      s"SELECT id, v, ${ScbfCdc.ChangeTypeCol} FROM cdc_sql_v")
      .as[(Int, Int, String)].collect().toSeq.sorted
    val expected =
      (100 until 150).map(i => (i, i * 10, "insert")) ++
        (0 until 50).map(i => (i, i * 10, "delete"))
    assert(got == expected.sorted)
    // plain CREATE refuses an existing name; OR REPLACE re-points
    val e = intercept[graft.scbf.ScbfFormatException](spark.sql(
      "CREATE TEMP VIEW cdc_sql_v AS TABLE CHANGES cdc_sql SINCE VERSION 1"))
    assert(e.getMessage.contains("OR REPLACE"), e.getMessage)
    spark.sql("CREATE OR REPLACE TEMP VIEW cdc_sql_v AS " +
      "TABLE CHANGES cdc_sql SINCE VERSION 1 UNTIL VERSION 2")
    assert(spark.sql("SELECT COUNT(*) FROM cdc_sql_v").head().getLong(0) == 50L)
    // RECONCILE FALSE: the SQL escape hatch for the trust check (the
    // API's reconcile=false) — parses and serves the same window
    spark.sql("CREATE OR REPLACE TEMP VIEW cdc_sql_v AS " +
      "TABLE CHANGES cdc_sql SINCE VERSION 1 UNTIL VERSION 2 RECONCILE FALSE")
    assert(spark.sql("SELECT COUNT(*) FROM cdc_sql_v").head().getLong(0) == 50L)
    // an ordinary CREATE TEMP VIEW ... AS SELECT never detours here
    spark.sql("CREATE OR REPLACE TEMP VIEW cdc_sql_plain AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM cdc_sql_plain").head().getInt(0) == 1)
    spark.catalog.dropTempView("cdc_sql_v")
    spark.catalog.dropTempView("cdc_sql_plain")
  }

  test("_commit_version carries DESCRIBE HISTORY ordinals, exact across folds") {
    val dir = tmpDir("scbf-cdc-ver")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_ver")
    spark.sql(s"CREATE TABLE cdc_ver (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val t1 = tick()
    writeWave(dir, 100, 200)
    spark.sql("DELETE FROM cdc_ver WHERE id < 100") // whole-file takedown
    val chain0 = ScbfDiscovery.versionedChain(qroot(dir), hconf)
    val total = chain0.last._3 + 1
    def vmap(): Map[String, Int] = changes(dir, t1)
      .select(col(ScbfCdc.ChangeTypeCol), col(ScbfCdc.CommitVersionCol))
      .distinct().as[(String, Int)].collect().toMap
    // live deltas: ordinals derive from the chain (name-millis bounds)
    // — the wave-2 insert is the second-to-last commit, the DELETE's
    // replacement the last, exactly DESCRIBE HISTORY COMMITS' axis
    assert(vmap() == Map("insert" -> (total - 2), "delete" -> (total - 1)))
    // every in-window change resolves (no nulls on a live chain)
    assert(changes(dir, t1)
      .filter(col(ScbfCdc.CommitVersionCol).isNull).count() == 0L)
    // fold the chain (noop removal sentinels are CDC-transparent):
    // the fold stamps each folded commit's ordinal into its entries
    // (V: tags), so the window re-renders IDENTICALLY after folding —
    // the boundary information versionTs loses for AS-OF rendering is
    // preserved for CDC stamping
    (0 until ScbfDiscovery.CompactThreshold).foreach { i =>
      ScbfDiscovery.append(qroot(dir), hconf, Seq(ScbfDiscovery.Entry(
        s"noop-$i${ScbfDiscovery.RemovalSuffix}", ScbfDiscovery.RemovedLen,
        System.currentTimeMillis())))
    }
    val chain1 = ScbfDiscovery.commitChain(qroot(dir), hconf)
    assert(chain1.exists(ScbfDiscovery.isFold), chain1.toString)
    assert(vmap() == Map("insert" -> (total - 2), "delete" -> (total - 1)))
    // the folded entries themselves carry the recorded ordinals
    val folded = ScbfDiscovery.readDelta(qroot(dir), hconf,
      chain1.find(ScbfDiscovery.isFold).get)
    assert(folded.exists(e => e.cdcTag.isDefined && e.commitVersion.contains(total - 1)),
      folded.map(e => (e.name, e.commitVersion)).toString)
  }

  test("a clone serves its own post-clone window; pre-branch windows refuse") {
    val src = tmpDir("scbf-cdc-clone-src")
    writeWave(src, 0, 100)
    val cdir = tmpDir("scbf-cdc-clone")
    val fs = qroot(cdir).getFileSystem(hconf)
    fs.delete(new Path(cdir), true)
    ScbfClone.write(new Path(cdir), hconf, qroot(src),
      ScbfDataSource.resolveFiles(Seq(src), hconf))
    val tB = tick() // at/after the branch point
    // the branch's own history: appends commit to the clone's own log
    writeWave(cdir, 100, 150)
    val got = rows(changes(cdir, tB))
    assert(got == (100 until 150).map(i => (i, i * 10, "insert")).sorted)
    // branch-LOCAL ordinals: the first post-clone commit is version 0
    val vs = changes(cdir, tB).select(col(ScbfCdc.CommitVersionCol))
      .distinct().as[Int].collect().toSeq
    assert(vs == Seq(0), vs.toString)
    // a window reaching past the branch point refuses, naming the cure
    val e = intercept[graft.scbf.ScbfFormatException](changes(cdir, 0L).collect())
    assert(e.getMessage.contains("branch point") &&
      e.getMessage.contains("SOURCE table"), e.getMessage)
  }

  test("misuse refuses: bad window, clones, overwrite boundary") {
    val dir = tmpDir("scbf-cdc-misuse")
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdc_misuse")
    spark.sql(s"CREATE TABLE cdc_misuse (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 10)
    val t1 = tick()
    intercept[IllegalArgumentException](
      ScbfCdc.changes(spark, dir))
    intercept[graft.scbf.ScbfFormatException](
      changes(dir, t1, Some(t1)).collect())
    // full overwrite: the restarted log cannot serve the old window
    (0 until 5).map(i => (i, i)).toDF("id", "v")
      .write.format("scbf").mode("overwrite").save(dir)
    val e = intercept[graft.scbf.ScbfFormatException](changes(dir, t1).collect())
    assert(e.getMessage.contains("fully overwritten"), e.getMessage)
  }
}
