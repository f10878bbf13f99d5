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

  /** Scratch directory for operators that materialize intermediate
   * files (e.g. the SCBF roundtrip). Driver-local java.io.tmpdir only
   * works in local mode; on a real cluster set `graft.scratch.dir` to a
   * shared filesystem path. */
  def scratchDir(s: SparkSession): String =
    s.conf.get("graft.scratch.dir", sys.props("java.io.tmpdir"))
}
