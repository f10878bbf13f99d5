package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** t17's reason to exist: the digest is a DATASET identity — invariant
 * under row order, file layout, and physical rewrites; changed by any
 * row mutation. This is the data-versioning primitive a reproducible
 * training run records next to its config. */
class DatasetFingerprintSpec extends AnyFunSuite with SparkTestBase {

  private def digestOf(df: DataFrame): Map[String, (Long, Long)] =
    df.select(col("src"),
        conv(substring(md5(concat_ws("|", col("id"), col("src"), col("txt"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def table(dir: String): DataFrame =
    spark.read.format("scbf").load(dir)
      .toDF("id", "src", "txt")

  test("digest survives OPTIMIZE/zorder rewrites; flips on any row change") {
    val dir = tmpDir("scbf-fp")
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("s"), (col("id") % 3).cast("int")).as("src"),
        concat(lit("text-"), col("id")).as("txt"))
      .repartition(4)
      .write.format("scbf").mode("overwrite").save(dir)
    val before = digestOf(table(dir))

    // physical rewrite 1: range clustering (different files, same rows)
    graft.sources.ScbfMaintenance.cluster(spark, dir, Seq("id"), 2)
    assert(digestOf(table(dir)) == before, "cluster must not change the digest")

    // physical rewrite 2: different partitioning entirely
    val copy = tmpDir("scbf-fp-copy")
    table(dir).repartition(7).toDF("id", "src", "txt")
      .write.format("scbf").mode("overwrite").save(copy)
    assert(digestOf(table(copy)) == before, "re-layout must not change the digest")

    // data change: one row deleted → that source's digest flips
    graft.sources.ScbfDelete.deleteWhere(spark, dir, new Configuration(),
      Array(EqualTo("id", 500)))
    val after = digestOf(table(dir))
    val victim = "s" + (500 % 3)
    assert(after(victim) != before(victim), "a dropped row must flip its source's digest")
    assert(before.keySet.filterNot(_ == victim).forall(k => after(k) == before(k)),
      "untouched sources keep their digests")
  }
}
