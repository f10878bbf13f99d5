package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Partition-scoped INSERT OVERWRITE — the idempotent re-ingest staple:
 * static (`INSERT OVERWRITE t PARTITION (grp='x')` → replace exactly
 * that partition's files, scope decided by path cells) and dynamic
 * (`partitionOverwriteMode=dynamic` → replace exactly the partitions
 * the insert produces rows for). Victims announce as a removal entry
 * (C:1), new files as plain entries — a caught-up stream sees the new
 * rows and applies its onChangeCommit policy to the disappearance.
 * Row-scoped overwrites on data columns are refused loudly.
 */
class PartitionOverwriteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def mk(name: String): String = {
    val dir = Files.createTempDirectory(s"scbf-ow-$name").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    spark.sql(s"CREATE TABLE $name (id INT, grp STRING, v INT) " +
      s"USING scbf PARTITIONED BY (grp) LOCATION '$dir'")
    (0 until 90).map(i => (i, s"g${i % 3}", i)).toDF("id", "grp", "v")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(2, grp) */ * FROM ${name}_src")
    dir
  }

  private def files(dir: String): Map[String, Long] =
    ScbfDataSource.resolveFiles(Seq(dir), new Configuration())
      .map(f => f.getPath.toUri.getPath -> f.getLen).toMap

  private def removals(dir: String): Seq[ScbfDiscovery.Entry] = {
    val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
    ScbfDiscovery.listDeltas(qroot, hconf)
      .flatMap(n => ScbfDiscovery.readDelta(qroot, hconf, n))
      .filter(_.name.endsWith(ScbfDiscovery.RemovalSuffix))
  }

  test("static INSERT OVERWRITE ... PARTITION replaces exactly that partition") {
    val dir = mk("ow_static")
    try {
      val before = files(dir)
      spark.sql("INSERT OVERWRITE ow_static PARTITION (grp='g1') " +
        "SELECT CAST(id AS INT), CAST(id AS INT) FROM range(1000, 1010)")
      val after = files(dir)
      // other partitions byte-identical under their original names
      val others = before.keySet.filterNot(_.contains("grp=g1"))
      assert(others.nonEmpty && others.forall(p => after.get(p).contains(before(p))),
        "out-of-scope partitions must not be touched")
      // g1 replaced wholesale: old files gone, only new content
      assert(before.keySet.filter(_.contains("grp=g1"))
        .forall(p => !after.contains(p)), "old g1 files must be deleted")
      assert(spark.sql("SELECT COUNT(*), MIN(id), MAX(id) FROM ow_static WHERE grp='g1'")
        .head() == org.apache.spark.sql.Row(10L, 1000, 1009))
      assert(spark.sql("SELECT COUNT(*) FROM ow_static").head().getLong(0) == 70L)
      // the disappearance is announced: one removal entry, old g1 names
      val rem = removals(dir)
      assert(rem.size == 1 && rem.head.rowsChanged &&
        rem.head.rewriteOf.forall(_.startsWith("grp=g1/")),
        s"victims must announce: $rem")
      // idempotent re-run: same result, one more removal entry
      spark.sql("INSERT OVERWRITE ow_static PARTITION (grp='g1') " +
        "SELECT CAST(id AS INT), CAST(id AS INT) FROM range(1000, 1010)")
      assert(spark.sql("SELECT COUNT(*) FROM ow_static WHERE grp='g1'")
        .head().getLong(0) == 10L)
    } finally spark.sql("DROP TABLE IF EXISTS ow_static")
  }

  test("static overwrite with an empty SELECT empties the partition but keeps it readable") {
    val dir = mk("ow_empty")
    try {
      spark.sql("INSERT OVERWRITE ow_empty PARTITION (grp='g2') " +
        "SELECT CAST(id AS INT), CAST(id AS INT) FROM range(0, 0)")
      assert(spark.sql("SELECT COUNT(*) FROM ow_empty WHERE grp='g2'")
        .head().getLong(0) == 0L)
      assert(spark.sql("SELECT COUNT(*) FROM ow_empty").head().getLong(0) == 60L)
      // keeper: the emptied partition stays a readable standalone table
      assert(spark.read.format("scbf").load(s"$dir/grp=g2").count() == 0L)
      assert(removals(dir).size == 1)
    } finally spark.sql("DROP TABLE IF EXISTS ow_empty")
  }

  test("dynamic partitionOverwriteMode replaces exactly the partitions in the data") {
    val dir = mk("ow_dyn")
    try {
      val before = files(dir)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        Seq((500, "g0", 1), (501, "g0", 2), (502, "gnew", 3))
          .toDF("id", "grp", "v").createOrReplaceTempView("ow_dyn_new")
        spark.sql("INSERT OVERWRITE ow_dyn SELECT * FROM ow_dyn_new")
      } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      // g0 replaced (3 old files gone, 2 new rows), g1/g2 untouched,
      // gnew created
      val after = files(dir)
      val others = before.keySet.filter(p => p.contains("grp=g1") || p.contains("grp=g2"))
      assert(others.forall(p => after.get(p).contains(before(p))),
        "partitions absent from the data must survive dynamic overwrite")
      assert(spark.sql("SELECT COUNT(*) FROM ow_dyn WHERE grp='g0'").head().getLong(0) == 2L)
      assert(spark.sql("SELECT COUNT(*) FROM ow_dyn WHERE grp='gnew'").head().getLong(0) == 1L)
      assert(spark.sql("SELECT COUNT(*) FROM ow_dyn").head().getLong(0) == 63L)
      val rem = removals(dir)
      assert(rem.size == 1 && rem.head.rewriteOf.forall(_.startsWith("grp=g0/")),
        s"only g0's files are victims: $rem")
    } finally spark.sql("DROP TABLE IF EXISTS ow_dyn")
  }

  test("row-scoped overwrite on a data column is refused with guidance") {
    mk("ow_refuse")
    try {
      val e = intercept[Exception] {
        // a v2 overwrite whose condition references a DATA column
        spark.sql("INSERT INTO ow_refuse REPLACE WHERE id < 10 " +
          "SELECT CAST(id AS INT), 'g0', CAST(id AS INT) FROM range(0, 5)")
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m => m.contains("DELETE") || m.contains("partition")),
        messages(e).mkString("|"))
    } finally spark.sql("DROP TABLE IF EXISTS ow_refuse")
  }

  test("a caught-up stream sees an overwritten partition's NEW rows; the old ones never retract (skip)") {
    val dir = mk("ow_stream")
    val ckpt = Files.createTempDirectory("scbf-ow-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.IntegerType, false)))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.size == 90)
      spark.sql("INSERT OVERWRITE ow_stream PARTITION (grp='g1') " +
        "SELECT CAST(id AS INT), CAST(id AS INT) FROM range(2000, 2005)")
      q.processAllAvailable()
      val ids = seen.flatten
      assert(ids.size == 95 && (2000 until 2005).forall(ids.contains),
        s"the overwrite's new rows must flow exactly once: ${ids.size}")
    } finally q.stop()
  }
}
