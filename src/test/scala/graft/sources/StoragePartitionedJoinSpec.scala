package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Storage-partitioned joins (SPJ): a partitioned SCBF table's scan
 * reports `KeyGroupedPartitioning` over its partition columns and keys
 * every split with the file's typed partition values, so two
 * co-partitioned tables join — and a table aggregates by its partition
 * columns — with ZERO shuffle. At 100 TB that deletes the largest
 * avoidable network cost of a co-partitioned layout entirely. ON BY
 * DEFAULT: Spark 4 ships `spark.sql.sources.v2.bucketing.enabled=true`
 * and we follow it.
 *
 * The cost side: under a reported key-grouping Spark plans one task
 * per partition VALUE (splits grouped), trading scan parallelism for
 * shuffle elimination — right whenever partitions outnumber cores
 * (always at 100 TB). Two exits exist and both are pinned here:
 * Spark's own conf, and the graft-side `graft.spj.enabled` escape
 * hatch for sessions that must keep Spark-level SPJ on for other
 * sources; with either off these scans plan exactly as before.
 */
class StoragePartitionedJoinSpec extends AnyFunSuite with SparkTestBase {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** SPJ session opt-in. Broadcast disabled so a co-partitioned join
   * cannot dodge the assertion by broadcasting the small test side. */
  private val Spj = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Final (AQE-resolved) plan, after execution. */
  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** A partitioned table with 4 `grp` partitions, two ingest waves so
   * every partition holds MULTIPLE files (grouping must merge them). */
  private def mkTable(name: String, grps: Seq[String]): String = {
    val dir = tmpDir(s"scbf-spj-$name")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id INT, n INT, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    import spark.implicits._
    (0 until 2).foreach { wave =>
      val rows = for (g <- grps; i <- 0 until 25)
        yield (wave * 1000 + i, i * 7 + wave, g)
      rows.toDF("id", "n", "grp").createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(4, grp) */ " +
        s"id, n, grp FROM ${name}_src")
    }
    dir
  }

  test("co-partitioned join on the partition column runs with zero shuffle") {
    val dirA = mkTable("spj_a", Seq("g0", "g1", "g2", "g3"))
    mkTable("spj_b", Seq("g0", "g1", "g2", "g3"))
    val q = """SELECT a.grp, COUNT(*) AS cnt, SUM(a.n + b.n) AS s
      FROM spj_a a JOIN spj_b b ON a.grp = b.grp GROUP BY a.grp"""
    // default path first: the reference answer, and the plan it costs
    val expected = spark.sql(q).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    withConfs(Spj: _*) {
      val df = spark.sql(q)
      val plan = executed(df)
      assert(!plan.contains("Exchange"),
        s"co-partitioned join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      val got = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    }
    // the key grouping really merged multiple files per partition value
    val files = ScbfDataSource.resolveFiles(Seq(dirA),
      spark.sessionState.newHadoopConf())
    assert(files.size > 4, s"setup must write >1 file per partition: ${files.size}")
  }

  test("GROUP BY the partition column aggregates without an exchange") {
    mkTable("spj_g", Seq("g0", "g1", "g2", "g3"))
    withConfs(Spj: _*) {
      val df = spark.sql(
        "SELECT grp, COUNT(*) AS cnt, SUM(n) AS s FROM spj_g GROUP BY grp")
      val plan = executed(df)
      assert(!plan.contains("Exchange"),
        s"partition-column aggregate must not shuffle:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum == 200L)
    }
  }

  test("a partition missing on one side joins correctly (pushed part values)") {
    mkTable("spj_m1", Seq("g0", "g1", "g2", "g3"))
    mkTable("spj_m2", Seq("g0", "g1", "g2")) // g3 absent on the right
    val q = """SELECT a.grp, COUNT(*) AS cnt
      FROM spj_m1 a JOIN spj_m2 b ON a.grp = b.grp GROUP BY a.grp"""
    val expected = spark.sql(q).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    withConfs(Spj: _*) {
      val df = spark.sql(q)
      val plan = executed(df)
      assert(!plan.contains("Exchange"), plan)
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected && !got.exists(_._1 == "g3"))
    }
  }

  test("Spark's v2.bucketing conf OFF restores the pre-SPJ shuffle plan") {
    mkTable("spj_off1", Seq("g0", "g1"))
    mkTable("spj_off2", Seq("g0", "g1"))
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "false") {
      val df = spark.sql("""SELECT a.grp, COUNT(*) AS cnt
        FROM spj_off1 a JOIN spj_off2 b ON a.grp = b.grp GROUP BY a.grp""")
      val plan = executed(df)
      assert(plan.contains("Exchange"),
        s"with v2 bucketing off, plans must be untouched by SPJ support:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum == 5000L) // 50×50 per grp × 2
    }
  }

  test("graft.spj.enabled=false is an equivalent graft-side escape hatch") {
    mkTable("spj_off3", Seq("g0", "g1"))
    mkTable("spj_off4", Seq("g0", "g1"))
    withConfs(Spj :+ (graft.GraftConf.SpjEnabled -> "false"): _*) {
      val df = spark.sql("""SELECT a.grp, COUNT(*) AS cnt
        FROM spj_off3 a JOIN spj_off4 b ON a.grp = b.grp GROUP BY a.grp""")
      val plan = executed(df)
      assert(plan.contains("Exchange"),
        s"graft.spj.enabled=false must restore the pre-SPJ plan:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum == 5000L)
    }
  }

  test("the parallelism trade is real and the knob undoes it (split grouping)") {
    val dir = mkTable("spj_grp", Seq("g0", "g1", "g2", "g3"))
    val files = ScbfDataSource.resolveFiles(Seq(dir),
      spark.sessionState.newHadoopConf())
    assert(files.size > 4, s"need >1 file per partition, got ${files.size}")
    // default (SPJ on): one task per partition VALUE — files merge
    val grouped = spark.sql("SELECT id, n, grp FROM spj_grp")
      .rdd.getNumPartitions
    assert(grouped == 4, s"key-grouped scan must plan 4 tasks, got $grouped")
    // partition column pruned from the output: no grouping possible
    val pruned = spark.sql("SELECT id, n FROM spj_grp").rdd.getNumPartitions
    assert(pruned == files.size,
      s"pruned-key scan must plan per-file, got $pruned vs ${files.size}")
    // the escape hatch restores per-file parallelism with the key kept
    withConfs(graft.GraftConf.SpjEnabled -> "false") {
      val flat = spark.sql("SELECT id, n, grp FROM spj_grp")
        .rdd.getNumPartitions
      assert(flat == files.size,
        s"knob off must plan per-file, got $flat vs ${files.size}")
    }
  }

  test("graft.spj.minPartitions gates the report by key count, not by feature") {
    val dir = mkTable("spj_minp", Seq("g0", "g1", "g2", "g3"))
    val files = ScbfDataSource.resolveFiles(Seq(dir),
      spark.sessionState.newHadoopConf())
    mkTable("spj_minp2", Seq("g0", "g1", "g2", "g3"))
    // above the table's key count: per-file tasks return and the join
    // shuffles — the size gate, without flipping the feature switch
    withConfs(Spj :+ (graft.GraftConf.SpjMinPartitions -> "32"): _*) {
      val flat = spark.sql("SELECT id, n, grp FROM spj_minp").rdd.getNumPartitions
      assert(flat == files.size,
        s"below-threshold key count must plan per-file, got $flat vs ${files.size}")
      val df = spark.sql("""SELECT a.grp, COUNT(*) AS cnt
        FROM spj_minp a JOIN spj_minp2 b ON a.grp = b.grp GROUP BY a.grp""")
      val plan = executed(df)
      assert(plan.contains("Exchange"),
        s"below the threshold the join shuffles:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum == 10000L)
    }
    // at/below the key count: the exchange-free grouping stands
    withConfs(Spj :+ (graft.GraftConf.SpjMinPartitions -> "4"): _*) {
      val grouped = spark.sql("SELECT id, n, grp FROM spj_minp").rdd.getNumPartitions
      assert(grouped == 4, s"at-threshold scan must key-group, got $grouped")
      val df = spark.sql("""SELECT a.grp, COUNT(*) AS cnt
        FROM spj_minp a JOIN spj_minp2 b ON a.grp = b.grp GROUP BY a.grp""")
      val plan = executed(df)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"at the threshold the join stays exchange-free:\n$plan")
    }
  }

  test("join on a NON-partition key still plans (shuffles) and answers correctly") {
    mkTable("spj_n1", Seq("g0", "g1"))
    mkTable("spj_n2", Seq("g0", "g1"))
    withConfs(Spj: _*) {
      val df = spark.sql("""SELECT COUNT(*) AS cnt
        FROM spj_n1 a JOIN spj_n2 b ON a.id = b.id AND a.grp = 'g0' AND b.grp = 'g0'""")
      val plan = executed(df)
      assert(plan.contains("Exchange"), plan) // id is not the partition key
      // 25 ids per wave appear in BOTH waves' id spaces? ids are
      // wave*1000+i so distinct per wave: 50 ids per grp per table,
      // matching 1:1 across tables within g0
      assert(df.collect().head.getLong(0) == 50L)
    }
  }

  test("path-based reads infer the key from the k=v tree and join shuffle-free") {
    val dirA = mkTable("spj_p1", Seq("g0", "g1", "g2"))
    val dirB = mkTable("spj_p2", Seq("g0", "g1", "g2"))
    withConfs(Spj: _*) {
      val a = spark.read.format("scbf").load(dirA)
      val b = spark.read.format("scbf").load(dirB)
      val df = a.join(b, "grp").groupBy("grp").count()
      val plan = executed(df)
      assert(!plan.contains("Exchange"),
        s"path reads carry the same key grouping:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum == 3 * 50L * 50L)
    }
  }

  test("projecting the partition column away degrades gracefully (no SPJ, no crash)") {
    mkTable("spj_proj", Seq("g0", "g1"))
    withConfs(Spj: _*) {
      val df = spark.sql("SELECT COUNT(DISTINCT id) AS d FROM spj_proj")
      assert(df.collect().head.getLong(0) == 50L)
    }
  }

  /** Two-level layout `grp=…/b=…`: the key is the FULL ordered cell
   * vector, and a join on both columns is exchange-free. */
  private def mkNested(name: String): String = {
    val dir = tmpDir(s"scbf-spj-$name")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id INT, n INT, grp STRING, b INT) " +
      s"USING scbf PARTITIONED BY (grp, b) LOCATION '$dir'")
    import spark.implicits._
    val rows = for (g <- Seq("g0", "g1"); bb <- 0 until 3; i <- 0 until 10)
      yield (bb * 100 + i, i, g, bb)
    rows.toDF("id", "n", "grp", "b").createOrReplaceTempView(s"${name}_src")
    spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(6, grp, b) */ " +
      s"id, n, grp, b FROM ${name}_src")
    dir
  }

  test("multi-column partition keys join exchange-free on the full key") {
    mkNested("spj_nest1")
    mkNested("spj_nest2")
    val q = """SELECT a.grp, a.b, COUNT(*) AS cnt
      FROM spj_nest1 a JOIN spj_nest2 b2 ON a.grp = b2.grp AND a.b = b2.b
      GROUP BY a.grp, a.b"""
    val expected = spark.sql(q).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    withConfs(Spj: _*) {
      val df = spark.sql(q)
      val plan = executed(df)
      assert(!plan.contains("Exchange"),
        s"two-column co-partitioned join must not shuffle:\n$plan")
      val got = df.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected && got.size == 6)
    }
  }

  /** The 100 TB HIGH-CARDINALITY shuffle-free join recipe: identity
   * partitioning can't make a directory per doc_id, but an explicit
   * bucket column (`id % B` computed at ingest) CAN be the partition
   * column, and a join whose keys INCLUDE it is exchange-free — the
   * key-grouping on (db) satisfies the (db, id) clustering on both
   * sides, so each bucket's rows sort-merge locally. */
  test("high-cardinality join via an explicit bucket column is exchange-free") {
    def mk(name: String): Unit = {
      val dir = tmpDir(s"scbf-spj-$name")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name (id INT, n INT, db INT) USING scbf " +
        s"PARTITIONED BY (db) LOCATION '$dir'")
      import spark.implicits._
      (0 until 200).map(i => (i, i * 3, i % 4)).toDF("id", "n", "db")
        .createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(4, db) */ " +
        s"id, n, db FROM ${name}_src")
    }
    mk("spj_hc1"); mk("spj_hc2")
    // per-bucket aggregate: a global COUNT would add the inherent
    // SinglePartition exchange and hide what we're pinning
    val q = """SELECT a.db, COUNT(*) AS cnt, SUM(a.n + b.n) AS s
      FROM spj_hc1 a JOIN spj_hc2 b ON a.db = b.db AND a.id = b.id
      GROUP BY a.db"""
    val expected = spark.sql(q).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // partition keys (db) are a strict SUBSET of the join keys (db, id):
    // Spark accepts the partial co-partition only with this conf off
    withConfs(Spj :+
        ("spark.sql.requireAllClusterKeysForCoPartition" -> "false"): _*) {
      val df = spark.sql(q)
      val plan = executed(df)
      assert(!plan.contains("Exchange"),
        s"bucket-column join (keys ⊇ partition cols) must not shuffle:\n$plan")
      val got = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected && got.toSeq.map(_._2).sum == 200L)
    }
  }

  /** Runtime (join-driven) file pruning re-plans input partitions
   * AFTER the key-grouping was reported; Spark then REQUIRES the
   * surviving partition values to be a subset of the originals. Our
   * runtime prune only drops files (keys ride along on every split),
   * so the contract holds — pinned here because a violation is a
   * runtime SparkException, not a wrong plan. */
  test("runtime file pruning (DPP) composes with the key-grouped report") {
    mkTable("spj_dpp", Seq("g0", "g1", "g2", "g3"))
    import spark.implicits._
    Seq(("g0", 1), ("g1", 2)).toDF("grp", "w").createOrReplaceTempView("spj_dpp_dim")
    // broadcast ENABLED: the BHJ's build side arrives as an In runtime
    // filter on the key-grouped fact scan (the q38 shape, now under a
    // reported KeyGroupedPartitioning)
    val df = spark.sql("""SELECT f.grp, COUNT(*) AS cnt
      FROM spj_dpp f JOIN spj_dpp_dim d ON f.grp = d.grp
      WHERE d.w = 1 GROUP BY f.grp""")
    val rows = df.collect()
    assert(rows.toSeq.map(r => (r.getString(0), r.getLong(1))) == Seq(("g0", 50L)))
  }

  test("a stray file outside the k=v tree disables the report, never corrupts it") {
    val dir = mkTable("spj_stray", Seq("g0", "g1"))
    // copy one partition's data file to the ROOT — readable, but with no
    // k=v cells on its path (its rows carry grp in the data itself)
    val hconf = spark.sessionState.newHadoopConf()
    val files = ScbfDataSource.resolveFiles(Seq(dir), hconf)
    val src = files.head.getPath
    val fs = src.getFileSystem(hconf)
    val stray = new org.apache.hadoop.fs.Path(dir, "stray.scbf")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, stray, false, hconf)
    withConfs(Spj: _*) {
      // path read sees the stray file: the scan must fall back to
      // UnknownPartitioning (shuffle) and still answer correctly —
      // a key-grouping with an unkeyable split would be a wrong plan
      val a = spark.read.format("scbf").load(dir)
      val df = a.groupBy("grp").count()
      val plan = executed(df)
      assert(plan.contains("Exchange"),
        s"stray file must disable the key-grouping report:\n$plan")
      // 100 rows + the duplicated file's rows
      val strayRows = spark.read.format("scbf").load(stray.toString).count()
      assert(df.collect().map(_.getLong(1)).sum == 100L + strayRows)
    }
  }
}
