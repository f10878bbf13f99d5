package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by every operator module — one definition each, so a
 * change to (say) the decimal-accumulation strategy cannot silently
 * apply to some queries and not others. */
private[operators] object Ops {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses; read
   * as nanos-since-epoch long (timezone-free, exact). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
  }

  /** Exact, order-independent double aggregation: per-row cast to a
   * decimal whose scale matches the data's true decimal precision, exact
   * integer-arithmetic SUM, then one cast back to double. Both engines
   * produce bit-identical results — no round-half boundary flips, which
   * plain ROUND(SUM(double)) suffers (observed: penny-off groups in the
   * per-order revenue sums). */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal-accumulated mean (see dsum). */
  def dmean(c: Column, scale: Int): Column =
    dsum(c, scale) / count(lit(1))

  /** Target partition count for spreading CPU-bound per-row work over
   * few-partition (single-file) inputs. Always pass this explicitly to
   * repartition: AQE coalesces a bare repartition(col) of a small table
   * straight back to one partition. */
  def spread(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Hierarchical (salted) per-group top-k — the scale-safe replacement
   * for a bare `row_number().over(partitionBy(group))`, which funnels
   * every row of a group through one task. Pass 1 ranks within
   * (group, salt) and keeps k per bucket; any row in the true global
   * top-k has at most k-1 rows ahead of it in its own bucket, so it
   * always survives. Pass 2 ranks the ≤ k·salts survivors per group.
   * `orderCols` must define a total order (tie-break to a unique key)
   * for the two passes to agree; `saltSrc` just needs to spread rows
   * (any per-row column works — assignment, not semantics). */
  def saltedTopK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      saltSrc: Column, k: Int, rankName: String, salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(groupCols :+ col("__salt"): _*).orderBy(orderCols: _*)
    val wFinal = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
      .withColumn("__lrn", row_number().over(wLocal))
      .filter(col("__lrn") <= k)
      .withColumn(rankName, row_number().over(wFinal))
      .filter(col(rankName) <= k)
      .drop("__salt", "__lrn")
  }

  /** Scratch directory for operators that materialize intermediate
   * files (e.g. the SCBF roundtrip). Driver-local java.io.tmpdir only
   * works in local mode; on a real cluster set `graft.scratch.dir` to a
   * shared filesystem path. */
  def scratchDir(s: SparkSession): String =
    s.conf.get("graft.scratch.dir", sys.props("java.io.tmpdir"))
}
