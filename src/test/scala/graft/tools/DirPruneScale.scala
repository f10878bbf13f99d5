package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}

import graft.sources._

/**
 * Directory-summary pre-prune at scale, on the layout where it bites:
 * a table whose data column is CLUSTERED BY PARTITION (disjoint id
 * ranges per directory — the natural shape of time/ingest-partitioned
 * tables, where the partition key correlates with ids/timestamps). A
 * narrow band over `n` directories × `fpp` files keeps O(1)
 * directories; the fingerprint-validated `dirsum` bounds drop the
 * others WITHOUT parsing their manifests — the plan bill becomes
 * O(directories) ~200 B head-reads + ONE manifest parse, vs every
 * directory's 10⁴-entry manifest under the per-file-only path.
 *
 * (PlanningScalePartitioned's fixture deliberately has the OPPOSITE
 * correlation — ids repeating in every partition — so its range row
 * measures the all-touched worst case; this probe is the clustered
 * contrast.)
 *
 * Usage: Test/runMain graft.tools.DirPruneScale [parts] [filesPerPart] [rows]
 */
object DirPruneScale {
  def main(args: Array[String]): Unit = {
    val parts = if (args.length > 0) args(0).toInt else 100
    val fpp = if (args.length > 1) args(1).toInt else 10000
    val rows = if (args.length > 2) args(2).toInt else 10
    val root = s"/tmp/scbf_dirprune_${parts}_$fpp"
    val conf = new Configuration()
    val existing = Option(new java.io.File(s"$root/pk=p00").list())
      .map(_.count(_.endsWith(".scbf"))).getOrElse(0)
    if (existing != fpp) {
      println(s"[dirprune] generating $parts x $fpp files (disjoint id ranges) ...")
      val t0 = System.nanoTime()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      (0 until parts).foreach { k =>
        PlanningScale.generate(f"$root/pk=p$k%02d", fpp, rows,
          offset = k * fpp * rows)
      }
      println(f"[dirprune] generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println(s"[dirprune] reusing $root")

    val listing = ScbfDataSource.resolveFiles(Seq(root), conf)
    require(listing.size == parts * fpp, s"listing saw ${listing.size}")
    // a band living entirely inside ONE directory's id range
    val mid = (parts / 2) * fpp * rows + fpp * rows / 2
    val filters = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("id", mid), LessThan("id", mid + rows))

    def timedPlan(label: String): Int = {
      Seq(ScbfStats.manifestReads, ScbfStats.summaryReads, ScbfUtil.dataFileOpens)
        .foreach(_.set(0))
      val t0 = System.nanoTime()
      val b = new ScbfScanBuilder(PlanningScalePartitioned.schemaP, listing,
        conf, Seq(root))
      b.pushFilters(filters)
      val k = b.build().asInstanceOf[ScbfScan].planInputPartitions().length
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[dirprune] $label%-40s ${ms}%10.1f ms  " +
        s"manifestReads=${ScbfStats.manifestReads.get} " +
        s"summaryReads=${ScbfStats.summaryReads.get} " +
        s"dataOpens=${ScbfUtil.dataFileOpens.get}")
      k
    }
    // twice: cold (head-reads) and warm-JVM
    val k1 = timedPlan("plan: band over clustered dirs (cold)")
    require(k1 == 1, s"expected 1 planned file, got $k1")
    require(ScbfStats.manifestReads.get == 1,
      s"only the surviving directory's manifest parses, got ${ScbfStats.manifestReads.get}")
    require(ScbfStats.summaryReads.get == parts,
      s"one head-read per directory, got ${ScbfStats.summaryReads.get}")
    val k2 = timedPlan("plan: band over clustered dirs (again)")
    require(k2 == 1 && ScbfStats.manifestReads.get == 1)
    println(s"[dirprune] ${parts - 1} of $parts directories dropped by dirsum " +
      s"bounds — their ${(parts - 1) * fpp} manifest entries never parsed")
  }
}
