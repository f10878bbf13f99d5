package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/**
 * HyperLogLog NDV sketch for SCBF columns — the distinct-count half of
 * the planner statistics story ([[ScbfScan.estimateStatistics]]):
 * min/max and row counts already flow to Catalyst; equality-selectivity
 * and join-cardinality estimation additionally want NDV, which no
 * single number can carry through file-level compaction — so each file
 * records a REGISTER ARRAY (mergeable by element-wise max, the defining
 * HLL property), the manifest stores one merged array per column per
 * DIRECTORY (a few KB — per-file arrays in the manifest would be
 * ~100 MB at 10⁵ files, defeating the one-small-read planning design),
 * and planning folds directories' registers into one estimate.
 *
 * Standard HLL (Flajolet et al.), p=11 → 2048 registers, ~2.3% typical
 * error — far inside what cost-based join estimation needs. 64-bit
 * XXH64 hashes (the hash family already on Spark's classpath and used
 * by the dedup operators), so no large-range correction is needed;
 * small-range uses linear counting. Deletes/updates cannot shrink a
 * sketch (HLL is insert-only): after a DELETE the directory NDV is an
 * over-estimate until the next OPTIMIZE/overwrite rebuilds it — safe
 * for an estimator, and the same staleness contract the rest of the
 * stats layer documents.
 */
object ScbfNdv {

  val P = 11
  val M: Int = 1 << P
  val Seed = 0x5cbfL

  final class Builder {
    val regs = new Array[Byte](M)

    @inline private def add(hash: Long): Unit = {
      val idx = (hash >>> (64 - P)).toInt
      // rank = leading zeros of the remaining 64-P bits, plus one
      val w = hash << P
      val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }

    def addInt(v: Int): Unit = add(XXH64.hashInt(v, Seed))
    def addDouble(v: Double): Unit =
      add(XXH64.hashLong(java.lang.Double.doubleToLongBits(v), Seed))
    def addBytes(b: Array[Byte]): Unit =
      add(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed))
  }

  /** Element-wise max — the HLL union: merged registers estimate the
   * distinct count of the UNION of the inputs' value sets exactly as if
   * one sketch had seen every value. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M,
      s"register arrays must be $M bytes, got ${a.length}/${b.length}")
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  def estimate(regs: Array[Byte]): Long = {
    require(regs.length == M, s"register array must be $M bytes, got ${regs.length}")
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * M.toDouble * M.toDouble / invSum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else e // 64-bit hash: no large-range correction needed
    math.round(corrected)
  }
}
