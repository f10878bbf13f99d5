package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * `PARTITIONED BY (bucket(n, intCol))` as a REAL catalog transform
 * (GraftCatalog): the writer routes rows to `<col>_bucket=<id>/`
 * directories by `floorMod(value, n)` — no bucket column leaks into
 * the schema — and the scan reports `KeyGroupedPartitioning` over the
 * bucket transform, which Spark resolves against the catalog's own V2
 * `bucket` function. Two co-bucketed high-cardinality fact tables
 * then join with ZERO exchanges on either side — the storage-
 * partitioned join the round-9 verdict asked to lift out of the
 * manual `db = doc_id % 32` recipe.
 */
class BucketTransformSpec extends AnyFunSuite with SparkTestBase {

  private val wh = tmpDir("graft-cat-wh")
  spark.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)

  test("writer routes by bucket; schema stays clean; reads are exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    spark.sql("DROP TABLE IF EXISTS gtest.db.bt")
    spark.sql("CREATE TABLE gtest.db.bt (id INT, v DOUBLE) USING scbf " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO gtest.db.bt SELECT CAST(id AS INT), CAST(id AS DOUBLE) " +
      "FROM range(0, 1000)")
    // layout: id_bucket=0..7, no other levels; schema has NO bucket col
    val subs = new java.io.File(s"$wh/db/bt").listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(subs.toSeq == (0 until 8).map(b => s"id_bucket=$b"), s"got ${subs.toSeq}")
    assert(spark.table("gtest.db.bt").columns.toSeq == Seq("id", "v"))
    // routing is floorMod(id, 8): every row is in its bucket directory
    (0 until 8).foreach { b =>
      val ids = spark.read.format("scbf").load(s"$wh/db/bt/id_bucket=$b")
        .select(col("id")).collect().map(_.getInt(0))
      assert(ids.nonEmpty && ids.forall(i => Math.floorMod(i, 8) == b),
        s"bucket $b holds wrong ids")
    }
    val r = spark.sql("SELECT COUNT(*), SUM(id), SUM(v) FROM gtest.db.bt").head()
    assert(r == org.apache.spark.sql.Row(1000L, 499500L, 499500.0))
    spark.sql("DROP TABLE gtest.db.bt")
  }

  test("co-bucketed fact JOIN fact runs with ZERO exchanges (SPJ on the transform)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    Seq("bta", "btb").foreach(t => spark.sql(s"DROP TABLE IF EXISTS gtest.db.$t"))
    spark.sql("CREATE TABLE gtest.db.bta (id INT, a DOUBLE) USING scbf " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("CREATE TABLE gtest.db.btb (id INT, b DOUBLE) USING scbf " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO gtest.db.bta SELECT CAST(id AS INT), CAST(id * 0.5 AS DOUBLE) " +
      "FROM range(0, 2000)")
    spark.sql("INSERT INTO gtest.db.btb SELECT CAST(id AS INT), CAST(id * 2.0 AS DOUBLE) " +
      "FROM range(0, 2000) WHERE id % 2 = 0")
    val oldBr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql("""SELECT COUNT(*) AS cnt, SUM(t1.a + t2.b) AS s
        FROM gtest.db.bta t1 JOIN gtest.db.btb t2 ON t1.id = t2.id""")
      val rows = q.collect()
      assert(rows.head.getLong(0) == 1000L)
      assert(rows.head.getDouble(1) ==
        (0 until 2000 by 2).map(i => i * 0.5 + i * 2.0).sum)
      val plan = q.queryExecution.executedPlan.toString
      // the JOIN must be exchange-free (no hash-repartition on either
      // side); the global aggregate's SinglePartition collect is not a
      // join shuffle and stays
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must be exchange-free:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBr)
    Seq("bta", "btb").foreach(t => spark.sql(s"DROP TABLE gtest.db.$t"))
  }

  test("bucket composes with identity partitions; row-level SQL stays correct") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    spark.sql("DROP TABLE IF EXISTS gtest.db.btc")
    spark.sql("CREATE TABLE gtest.db.btc (id INT, grp STRING, v DOUBLE) USING scbf " +
      "PARTITIONED BY (grp, bucket(4, id))")
    spark.sql("INSERT INTO gtest.db.btc SELECT CAST(id AS INT), " +
      "concat('g', CAST(id % 2 AS INT)), CAST(id AS DOUBLE) FROM range(0, 400)")
    // layout: grp=g0/id_bucket=*/ — identity outermost. g0 holds the
    // EVEN ids, whose floorMod(id, 4) is only ever 0 or 2
    val buckets = new java.io.File(s"$wh/db/btc/grp=g0").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(buckets.toSeq == Seq("id_bucket=0", "id_bucket=2"), s"got ${buckets.toSeq}")
    // partition pruning on the identity level still bites
    assert(spark.sql("SELECT COUNT(*) FROM gtest.db.btc WHERE grp = 'g1'")
      .head().getLong(0) == 200L)
    // DELETE (stats-scoped) and UPDATE (copy-on-write) keep bucket routing
    spark.sql("DELETE FROM gtest.db.btc WHERE id >= 300")
    assert(spark.sql("SELECT COUNT(*) FROM gtest.db.btc").head().getLong(0) == 300L)
    spark.sql("UPDATE gtest.db.btc SET v = 0.0 WHERE id % 10 = 0")
    assert(spark.sql("SELECT COUNT(*) FROM gtest.db.btc WHERE v = 0.0")
      .head().getLong(0) == 30L)
    // replacement files landed INSIDE bucket directories (never a
    // partition-root stray): every data file sits under id_bucket=*
    val stray = ScbfDataSource.resolveFiles(Seq(s"$wh/db/btc"),
      spark.sessionState.newHadoopConf())
      .filterNot(_.getPath.toString.contains("id_bucket="))
    assert(stray.isEmpty, s"files escaped bucket routing: $stray")
    spark.sql("DROP TABLE gtest.db.btc")
  }

  test("graft-catalog SHALLOW CLONE of a bucketed source: routed appends, zero-exchange branch join") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    Seq("btsrc", "btdim", "btbr").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS gtest.db.$t"))
    spark.sql("CREATE TABLE gtest.db.btsrc (id INT, a DOUBLE) USING scbf " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("CREATE TABLE gtest.db.btdim (id INT, b DOUBLE) USING scbf " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO gtest.db.btsrc SELECT CAST(id AS INT), " +
      "CAST(id * 0.5 AS DOUBLE) FROM range(0, 1000)")
    spark.sql("INSERT INTO gtest.db.btdim SELECT CAST(id AS INT), " +
      "CAST(id * 2.0 AS DOUBLE) FROM range(0, 1200)")
    // the round-13 spelling: a graft-catalog TARGET records the
    // source's transforms verbatim, bucket included
    ScbfUtil.dataFileOpens.set(0)
    spark.sql("CREATE TABLE gtest.db.btbr SHALLOW CLONE gtest.db.btsrc")
    assert(ScbfUtil.dataFileOpens.get == 0, "clone must open zero data files")
    // the branch's OWN append routes into bucket directories of the
    // CLONE root (the session-target trade was a flat local file)
    spark.sql("INSERT INTO gtest.db.btbr SELECT CAST(id AS INT), " +
      "CAST(7.0 AS DOUBLE) FROM range(1000, 1100)")
    val localFiles = ScbfDataSource.resolveFiles(Seq(s"$wh/db/btbr"),
      spark.sessionState.newHadoopConf())
      .filter(_.getPath.toString.contains("/db/btbr/"))
    assert(localFiles.nonEmpty &&
      localFiles.forall(_.getPath.toString.contains("id_bucket=")),
      s"branch appends must route by bucket: ${localFiles.map(_.getPath)}")
    // rows: refs ∪ routed locals, exact
    assert(spark.sql("SELECT COUNT(*) FROM gtest.db.btbr").head().getLong(0) == 1100L)
    // the APPENDED-TO branch still joins a co-bucketed table with zero
    // exchanges — the key-grouped contract survives local appends
    // because they honor the same bucket layout
    val oldBr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql("""SELECT COUNT(*) AS cnt, SUM(t1.a + t2.b) AS s
        FROM gtest.db.btbr t1 JOIN gtest.db.btdim t2 ON t1.id = t2.id""")
      assert(q.collect().head.getLong(0) == 1100L)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed branch join must be exchange-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBr)
    Seq("btbr", "btdim", "btsrc").foreach(t => spark.sql(s"DROP TABLE gtest.db.$t"))
  }

  test("catalog name parts that would escape the warehouse directory refuse") {
    val wh = tmpDir("graft-escape-wh")
    val cat = new GraftCatalog
    cat.initialize("gesc", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id INT")
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sessionState.newHadoopConf())
    // plant a victim OUTSIDE the warehouse that a traversal would reach
    val victim = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh).getParent, "gesc-victim")
    fs.mkdirs(victim)
    try {
      for (bad <- Seq("../gesc-victim", "a/b", "..", ".hidden", "")) {
        intercept[Exception] {
          cat.createTable(
            org.apache.spark.sql.connector.catalog.Identifier.of(
              Array.empty[String], bad),
            schema, Array.empty, java.util.Collections.emptyMap())
        }
        intercept[Exception] {
          cat.dropTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            Array(bad), "t"))
        }
        intercept[Exception] { cat.dropNamespace(Array(bad), cascade = true) }
      }
      assert(fs.exists(victim), "a traversal identifier deleted outside the warehouse")
    } finally fs.delete(victim, true)
  }

  test("guards: non-int bucket column, multiple buckets, bucket not last all refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.bad1 (id INT, s STRING) USING scbf " +
        "PARTITIONED BY (bucket(4, s))")
    }
    assert(e1.getMessage.contains("must be INT"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.bad2 (id INT, k INT) USING scbf " +
        "PARTITIONED BY (bucket(4, id), bucket(4, k))")
    }
    assert(e2.getMessage.contains("at most one bucket"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.bad3 (id INT, grp STRING) USING scbf " +
        "PARTITIONED BY (bucket(4, id), grp)")
    }
    assert(e3.getMessage.contains("LAST"), e3.getMessage)
  }
}
