package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Manifest corruption is LOCAL: one torn entry costs that file's
 * manifest coverage (sidecar fallback), one bad dirndv line costs that
 * column's NDV — never the other 10⁵ entries. Structural corruption
 * (bad header) still drops the whole manifest, degrading to sidecars. */
class ManifestRobustnessSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit =
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"), (col("id") * 2.5).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)

  private def manifestFile(dir: String) =
    Paths.get(dir, ScbfStats.manifestPath(new Path(dir)).getName)

  private def manifestText(dir: String): String =
    new String(Files.readAllBytes(manifestFile(dir)), UTF_8)

  private def overwriteManifest(dir: String, text: String): Unit = {
    Files.write(manifestFile(dir), text.getBytes(UTF_8))
    // drop Hadoop LocalFileSystem's checksum shadow — we tampered with
    // the bytes out-of-band, and a CRC mismatch would model a DIFFERENT
    // failure (torn read) than the content corruption under test
    Files.deleteIfExists(
      Paths.get(dir, "." + manifestFile(dir).getFileName.toString + ".crc"))
  }

  test("one corrupt entry: others still serve from the manifest; victim falls back to sidecar") {
    val dir = tmpDir("scbf-man-corrupt")
    writeRanged(dir)
    val lines = manifestText(dir).split("\n").toSeq
    val firstFile = lines.indexWhere(_.startsWith("file\t"))
    // tear the first entry's rows line into garbage
    val torn = lines.updated(firstFile + 1, "rows\tNOT_A_NUMBER")
    overwriteManifest(dir, torn.mkString("\n"))
    val man = ScbfStats.readManifestFull(new Path(dir), new Configuration()).entries
    assert(man.size == 3, s"3 intact entries must survive, got ${man.keySet}")
    // pruning still works: the torn file falls back to its own sidecar
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    val pruner = new ScbfStats.Pruner(conf, Seq(EqualTo("id", 10)))
    val kept = pruner.keepAll(files)(_.getPath, _.getLen)
    assert(kept.size == 1, s"pruning must still isolate one file, kept ${kept.size}")
    assert(ScbfStats.sidecarReads.get >= 1, "victim entry served by sidecar fallback")
  }

  test("one corrupt dirndv line loses only that column's NDV") {
    val dir = tmpDir("scbf-man-ndv")
    writeRanged(dir)
    val lines = manifestText(dir).split("\n").toSeq
    val idNdv = lines.indexWhere(_.startsWith("dirndv\tid\t"))
    assert(idNdv >= 0, "manifest must carry dirndv lines")
    val torn = lines.updated(idNdv, "dirndv\tid\t%%%not-base64%%%")
    overwriteManifest(dir, torn.mkString("\n"))
    val md = ScbfStats.readManifestFull(new Path(dir), new Configuration())
    val (man, ndv) = (md.entries, md.ndv)
    assert(man.size == 4, "entries unaffected")
    assert(!ndv.contains("id") && ndv.contains("v"),
      s"only id's NDV drops, got ${ndv.keySet}")
  }

  test("wrong-length dirndv registers are ignored, not trusted") {
    val dir = tmpDir("scbf-man-ndvlen")
    writeRanged(dir)
    val lines = manifestText(dir).split("\n").toSeq
    val idNdv = lines.indexWhere(_.startsWith("dirndv\tid\t"))
    val torn = lines.updated(idNdv,
      "dirndv\tid\t" + java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    overwriteManifest(dir, torn.mkString("\n"))
    val ndv = ScbfStats.readManifestFull(new Path(dir), new Configuration()).ndv
    assert(!ndv.contains("id"))
  }

  test("one corrupt dirtopk line loses only that column's summary — never the plan") {
    val dir = tmpDir("scbf-man-topk")
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("s"), (col("id") % 3).cast("string")).as("src"))
      .repartition(2)
      .write.format("scbf").mode("overwrite").save(dir)
    val lines = manifestText(dir).split("\n").toSeq
    val topkLine = lines.indexWhere(_.startsWith("dirtopk\tsrc\t"))
    assert(topkLine >= 0, "manifest must carry a dirtopk line for src")
    val conf = new Configuration()
    // intact: the summary parses and selectivity applies
    val intact = ScbfStats.readManifestFull(new Path(dir), conf)
    assert(intact.topk.contains("src"))
    // torn: ONLY this column's summary is lost; entries, ndv, hist stay
    overwriteManifest(dir,
      lines.updated(topkLine, "dirtopk\tsrc\tgarbage|not|numbers").mkString("\n"))
    val torn = ScbfStats.readManifestFull(new Path(dir), conf)
    assert(!torn.topk.contains("src"), "torn summary must parse to nothing")
    assert(torn.entries.size == intact.entries.size, "entries must survive")
    assert(torn.ndv.keySet == intact.ndv.keySet, "NDV must survive")
    // and the scan still plans (selectivity falls back to 1.0 — the
    // summary is estimator input only, never a correctness dependency)
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf, Seq(dir))
    b.pushFilters(Array(EqualTo("src", "s1")))
    val scan = b.build().asInstanceOf[ScbfScan]
    assert(scan.planInputPartitions().nonEmpty)
    val stats = scan.estimateStatistics()
    assert(stats.numRows.isPresent && stats.numRows.getAsLong == 1000,
      "without a summary the row estimate must stay unscaled")
  }

  test("corrupt dirsum lines fall back to per-file evidence, never a wrong aggregate") {
    val dir = tmpDir("scbf-man-dirsum")
    writeRanged(dir)
    def ans() = spark.read.format("scbf").load(dir)
      .agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id"))).head()
    val truth = ans()
    // (a) torn dirsum header line → summary unreadable → fallback, same answer
    val text = manifestText(dir)
    assert(text.contains("dirsum\t"), "fixture must carry a summary")
    overwriteManifest(dir,
      text.replaceFirst("dirsum\t\\d+", "dirsum\tgarbage"))
    assert(ScbfStats.readDirSummary(new Path(dir), new Configuration()).isEmpty,
      "a torn dirsum must read as absent")
    spark.read.format("scbf").load(dir).queryExecution // no cache of scans
    assert(ans() == truth, "fallback answer must equal the pushed one")
    // (b) a STALE but well-formed summary (wrong fingerprint — models a
    // crashed writer that never refreshed it) is rejected by matches()
    val conf = new Configuration()
    overwriteManifest(dir,
      text.replaceFirst("dirsum\t(\\d+)\t-?\\d+", "dirsum\t$1\t12345"))
    val stale = ScbfStats.readDirSummary(new Path(dir), conf)
    assert(stale.isDefined, "well-formed summary parses")
    val listing = ScbfDataSource.resolveFiles(Seq(dir), conf)
    assert(!stale.get.matches(listing), "wrong fingerprint must not match")
    assert(ans() == truth)
    // (c) a corrupt dirsumcol value breaks only the summary, not the
    // manifest's entries (per-file pruning still serves)
    overwriteManifest(dir,
      text.replaceFirst("(dirsumcol\tid\t)[-\\d.E]+", "$1notanumber"))
    assert(ScbfStats.readDirSummary(new Path(dir), conf).isEmpty)
    assert(ScbfStats.readManifest(new Path(dir), conf).nonEmpty,
      "entries must survive a corrupt summary line")
    assert(ans() == truth)
  }

  test("structural corruption (bad header) drops the manifest; sidecars keep pruning exact") {
    val dir = tmpDir("scbf-man-header")
    writeRanged(dir)
    overwriteManifest(dir, "not a manifest at all\ngarbage")
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val pruner = new ScbfStats.Pruner(conf, Seq(EqualTo("id", 10)))
    val kept = pruner.keepAll(files)(_.getPath, _.getLen)
    assert(kept.size == 1, "sidecar fallback still prunes to one file")
    // and results stay correct regardless
    assert(spark.read.format("scbf").load(dir).filter(col("id") === 10).count() == 1)
  }
}
