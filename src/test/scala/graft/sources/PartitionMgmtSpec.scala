package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * SupportsPartitionManagement over the hive-layout directory tree:
 * SHOW PARTITIONS (full + partial spec), ALTER TABLE ADD/DROP
 * PARTITION, TRUNCATE TABLE ... PARTITION — the partition IS its k=v
 * directory, DROP/TRUNCATE announce removal entries to the root
 * discovery log (streams keep onChangeCommit semantics), ADD/TRUNCATE
 * leave a 0-row keeper (readable-empty-table contract).
 */
class PartitionMgmtSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def mk(name: String): String = {
    val dir = Files.createTempDirectory(s"scbf-pm-$name").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id INT, grp STRING, b INT, v DOUBLE) " +
      s"USING scbf PARTITIONED BY (grp, b) LOCATION '$dir'")
    (0 until 120).map(i => (i, s"g${i % 3}", i % 2, i * 0.5))
      .toDF("id", "grp", "b", "v").createOrReplaceTempView(s"${name}_src")
    spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(2, grp, b) */ id, grp, b, v FROM ${name}_src")
    dir
  }

  private def rootRemovals(dir: String): Seq[ScbfDiscovery.Entry] = {
    val conf = new Configuration()
    val qroot = new Path(dir).getFileSystem(conf).makeQualified(new Path(dir))
    ScbfDiscovery.listDeltas(qroot, conf)
      .flatMap(n => ScbfDiscovery.readDelta(qroot, conf, n))
      .filter(_.name.endsWith(ScbfDiscovery.RemovalSuffix))
  }

  test("SHOW PARTITIONS: full listing and partial-spec filtering, typed columns") {
    mk("pm_show")
    try {
      val all = spark.sql("SHOW PARTITIONS pm_show")
        .collect().map(_.getString(0)).sorted
      assert(all.toSeq == Seq(
        "grp=g0/b=0", "grp=g0/b=1", "grp=g1/b=0", "grp=g1/b=1",
        "grp=g2/b=0", "grp=g2/b=1"), s"full listing: ${all.toSeq}")
      val part = spark.sql("SHOW PARTITIONS pm_show PARTITION (grp='g1')")
        .collect().map(_.getString(0)).sorted
      assert(part.toSeq == Seq("grp=g1/b=0", "grp=g1/b=1"), s"partial: ${part.toSeq}")
      val one = spark.sql("SHOW PARTITIONS pm_show PARTITION (grp='g2', b=1)")
        .collect().map(_.getString(0))
      assert(one.toSeq == Seq("grp=g2/b=1"), s"full spec: ${one.toSeq}")
    } finally spark.sql("DROP TABLE IF EXISTS pm_show")
  }

  test("ADD PARTITION creates a readable keeper directory; duplicate add refuses") {
    val dir = mk("pm_add")
    try {
      spark.sql("ALTER TABLE pm_add ADD PARTITION (grp='gnew', b=7)")
      assert(spark.sql("SHOW PARTITIONS pm_add").collect()
        .exists(_.getString(0) == "grp=gnew/b=7"))
      // the keeper makes the fresh partition directly readable
      assert(spark.read.format("scbf").load(s"$dir/grp=gnew/b=7").count() == 0L)
      assert(spark.sql("SELECT COUNT(*) FROM pm_add").head().getLong(0) == 120L)
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE pm_add ADD PARTITION (grp='gnew', b=7)")
      }
      assert(e.getMessage.toLowerCase.contains("already exist"), e.getMessage)
      // rows INSERTed into the added partition coexist with the keeper
      spark.sql("INSERT INTO pm_add VALUES (999, 'gnew', 7, 1.0)")
      assert(spark.sql("SELECT COUNT(*) FROM pm_add WHERE grp='gnew'").head().getLong(0) == 1L)
      // a custom partition LOCATION would detach the partition from
      // the k=v tree every other path walks — refused loudly
      val loc = intercept[Exception] {
        spark.sql("ALTER TABLE pm_add ADD PARTITION (grp='gloc', b=1) LOCATION '/tmp/elsewhere'")
      }
      assert(loc.getMessage.contains("LOCATION"), loc.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS pm_add")
  }

  test("DROP PARTITION removes the directory and announces removals to the root log") {
    val dir = mk("pm_drop")
    try {
      ScbfUtil.dataFileOpens.set(0)
      spark.sql("ALTER TABLE pm_drop DROP PARTITION (grp='g1', b=0)")
      assert(ScbfUtil.dataFileOpens.get == 0, "a drop is pure metadata work")
      assert(!new java.io.File(s"$dir/grp=g1/b=0").exists(), "directory must be gone")
      assert(spark.sql("SELECT COUNT(*) FROM pm_drop").head().getLong(0) == 100L)
      assert(!spark.sql("SHOW PARTITIONS pm_drop").collect()
        .exists(_.getString(0) == "grp=g1/b=0"))
      val rem = rootRemovals(dir)
      assert(rem.size == 1 && rem.head.rowsChanged &&
        rem.head.name.startsWith("grp=g1/b=0/") &&
        rem.head.rewriteOf.nonEmpty &&
        rem.head.rewriteOf.forall(_.startsWith("grp=g1/b=0/")),
        s"subdir-qualified removal entry: $rem")
      // droping a missing partition: IF EXISTS is quiet, bare errors
      spark.sql("ALTER TABLE pm_drop DROP IF EXISTS PARTITION (grp='g1', b=0)")
      intercept[Exception] {
        spark.sql("ALTER TABLE pm_drop DROP PARTITION (grp='g1', b=0)")
      }
    } finally spark.sql("DROP TABLE IF EXISTS pm_drop")
  }

  test("RENAME PARTITION declines with guidance; the UPDATE path does the actual move") {
    mk("pm_ren")
    try {
      // a directory rename would leave the STORED partition values
      // (in the data files — what makes every partition a standalone
      // table) contradicting the path, so rename is a row rewrite by
      // definition — the error routes to the copy-on-write UPDATE
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE pm_ren PARTITION (grp='g0', b=1) " +
          "RENAME TO PARTITION (grp='gren', b=9)")
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("UPDATE")), messages(e).mkString("|"))
      // the documented path: copy-on-write UPDATE moves the rows
      val before = spark.sql("SELECT COUNT(*) FROM pm_ren WHERE grp='g0' AND b=1")
        .head().getLong(0)
      assert(before > 0)
      spark.sql("UPDATE pm_ren SET grp='gren', b=9 WHERE grp='g0' AND b=1")
      assert(spark.sql("SELECT COUNT(*) FROM pm_ren WHERE grp='gren' AND b=9")
        .head().getLong(0) == before)
      assert(spark.sql("SELECT COUNT(*) FROM pm_ren").head().getLong(0) == 120L)
      val parts = spark.sql("SHOW PARTITIONS pm_ren").collect().map(_.getString(0))
      assert(parts.contains("grp=gren/b=9"))
    } finally spark.sql("DROP TABLE IF EXISTS pm_ren")
  }

  test("PARTITION (db=-0.0) targets the db=0.0 directory the writer creates") {
    // the writer normalizes -0.0 to 0.0 when routing rows
    // (ScbfWrite.cellString), so identifier rendering must too — else
    // DROP/TRUNCATE (db=-0.0) silently misses and ADD plants a
    // directory the normalized key contract says cannot exist
    val dir = Files.createTempDirectory("scbf-pm-negzero").toString
    spark.sql("DROP TABLE IF EXISTS pm_nz")
    spark.sql(s"CREATE TABLE pm_nz (id INT, db DOUBLE) USING scbf " +
      s"PARTITIONED BY (db) LOCATION '$dir'")
    try {
      Seq((1, -0.0), (2, 0.0), (3, 1.5)).toDF("id", "db")
        .createOrReplaceTempView("pm_nz_src")
      spark.sql("INSERT INTO pm_nz SELECT id, db FROM pm_nz_src")
      assert(new java.io.File(s"$dir/db=0.0").exists() &&
        !new java.io.File(s"$dir/db=-0.0").exists(), "writer routes -0.0 to db=0.0")
      // SHOW PARTITIONS with the -0.0 spec finds the normalized partition
      val shown = spark.sql("SHOW PARTITIONS pm_nz PARTITION (db=-0.0)")
        .collect().map(_.getString(0))
      assert(shown.toSeq == Seq("db=0.0"), s"spec must normalize: ${shown.toSeq}")
      // TRUNCATE with the -0.0 spelling hits the real directory
      spark.sql("TRUNCATE TABLE pm_nz PARTITION (db=-0.0)")
      assert(spark.sql("SELECT COUNT(*) FROM pm_nz WHERE db = 0.0").head().getLong(0) == 0L)
      assert(spark.sql("SELECT COUNT(*) FROM pm_nz").head().getLong(0) == 1L)
      // DROP with the -0.0 spelling removes it (no silent false)
      spark.sql("ALTER TABLE pm_nz DROP PARTITION (db=-0.0)")
      assert(!new java.io.File(s"$dir/db=0.0").exists(), "db=0.0 must be gone")
      // ADD with -0.0 creates the normalized directory, not db=-0.0
      spark.sql("ALTER TABLE pm_nz ADD PARTITION (db=-0.0)")
      assert(new java.io.File(s"$dir/db=0.0").exists() &&
        !new java.io.File(s"$dir/db=-0.0").exists(), "ADD must normalize too")
    } finally spark.sql("DROP TABLE IF EXISTS pm_nz")
  }

  test("TRUNCATE TABLE ... PARTITION empties exactly that partition, keeps it listed and readable") {
    val dir = mk("pm_trunc")
    try {
      val beforeOther = spark.sql("SELECT COUNT(*) FROM pm_trunc WHERE grp='g0'")
        .head().getLong(0)
      spark.sql("TRUNCATE TABLE pm_trunc PARTITION (grp='g2', b=1)")
      assert(spark.sql("SELECT COUNT(*) FROM pm_trunc WHERE grp='g2' AND b=1")
        .head().getLong(0) == 0L)
      assert(spark.sql("SELECT COUNT(*) FROM pm_trunc WHERE grp='g0'")
        .head().getLong(0) == beforeOther, "other partitions untouched")
      // still a listed partition AND a readable standalone directory
      assert(spark.sql("SHOW PARTITIONS pm_trunc").collect()
        .exists(_.getString(0) == "grp=g2/b=1"))
      assert(spark.read.format("scbf").load(s"$dir/grp=g2/b=1").count() == 0L)
      assert(rootRemovals(dir).size == 1, "the truncate announces its removals")
    } finally spark.sql("DROP TABLE IF EXISTS pm_trunc")
  }
}
