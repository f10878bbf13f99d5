package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._

/**
 * Stats-answered aggregate pushdown for SCBF scans (DSv2
 * `SupportsPushDownAggregates`, complete pushdown only) — the Parquet
 * footer-aggregate idea applied to the stats manifest. A global
 * `COUNT(*) / COUNT(col) / MIN / MAX / SUM(int)` over a 100 TB directory
 * is answered from ONE manifest read on the driver: zero data files
 * opened, zero tasks beyond the single result row.
 *
 * Correctness rules (each falls back to a normal scan by returning None,
 * never to a wrong answer):
 *  - Every file must have length-guarded trusted stats (manifest entry
 *    or sidecar matching the live listing) — one unknown file disables
 *    the whole pushdown.
 *  - COUNT(*) and COUNT(col) are the summed `rows` (SCBF stores no
 *    nulls, so COUNT(col) = COUNT(*); a NaN is not null). DISTINCT is
 *    never answerable from per-file stats.
 *  - MIN/MAX need a stats entry in every file with rows > 0. A
 *    NaN-bearing double column has its entry suppressed (NaN sorts
 *    above every double in Spark, so stats ignoring it would be wrong)
 *    and falls back. Utf8 bounds are truncated in general, but bounds
 *    that fit whole under the cap carry an exactness flag
 *    (ScbfStats.strRange) — MIN/MAX(string) is served when the WINNING
 *    bound is exact (short strings: codes, labels), declining
 *    otherwise.
 *  - SUM pushes only for int32 columns, whose recorded per-file sums are
 *    exact and order-independent; a float sum depends on accumulation
 *    order and is never recorded. Merging uses addExact — on overflow we
 *    fall back to the scan, which raises Spark's own overflow behavior.
 *  - GROUP BY pushes ONLY over partition columns, and only when EVERY
 *    file carries a parseable `k=v` cell for every grouping column (the
 *    cell IS the value for every row of the file — the writer routes
 *    rows by value, so the key is exact, not a bound). Per-group
 *    aggregates reuse the same per-file stats; a 100 TB
 *    `SELECT part_col, COUNT(*)/MIN/MAX/SUM ... GROUP BY part_col`
 *    rollup is answered from the manifests alone — one row per live
 *    partition, zero data files opened. Groups whose files hold ZERO
 *    rows (keepers from ADD/TRUNCATE PARTITION) are omitted: a SQL
 *    group only exists where rows do.
 *  - Only when no filter is pushed (Catalyst only pushes aggregates
 *    below fully-handled filters, and SCBF filters are always
 *    residual; the guard here is defense in depth).
 */
object ScbfAgg {

  /** A fully-evaluated pushed aggregation: the scan's result schema and
   * its rows (ONE row for a global aggregate, one per live partition
   * value for a grouped one), plus a human string for `.explain`. */
  final case class Result(schema: StructType, rows: Seq[Seq[Any]], description: String)

  def compute(
      agg: Aggregation,
      tableSchema: StructType,
      files: Seq[FileStatus],
      conf: Configuration,
      partitionRoots: Seq[String]): Option[Result] = {
    if (agg.aggregateExpressions.isEmpty) return None
    // FAST PATH — O(partitions), not O(files): each directory's
    // manifest leads with a DirSummary (rows + per-column fold over
    // exactly its entries, fingerprinted against the live listing).
    // When every directory's summary matches its listed files, the
    // whole aggregate evaluates over one synthetic FileStats per
    // DIRECTORY — a head-read per manifest, never the 10⁴+ per-file
    // entry parses. Any mismatch (unmanifested append, crashed
    // rewrite, pre-summary manifest) falls back to the per-file path
    // below, which re-derives trust from per-entry length guards.
    val byDir = files.groupBy(_.getPath.getParent).toSeq
    val summaried = byDir.map { case (d, fsIn) =>
      (fsIn, ScbfStats.readDirSummary(d, conf))
    }
    val units: Seq[(FileStatus, ScbfStats.FileStats)] =
      if (summaried.forall { case (fsIn, s) => s.exists(_.matches(fsIn)) })
        summaried.map { case (fsIn, s) => (fsIn.head, s.get.toFileStats) }
      else {
        val lookup = new ScbfStats.Lookup(conf)
        // one manifest per partition directory, loaded in parallel: a
        // 100-partition metadata-only rollup costs ~one manifest parse
        // of driver wall instead of a sequential hundred (BENCH_NOTES)
        lookup.prewarm(files.map(_.getPath.getParent))
        val perFile = files.map(f => lookup.stats(f.getPath, f.getLen))
        if (perFile.exists(_.isEmpty)) return None // unknown file → full scan
        files.zip(perFile.flatten)
      }
    val stats = units.map(_._2)
    val descr = agg.aggregateExpressions.map(_.toString).mkString(", ")

    if (agg.groupByExpressions.isEmpty) {
      evalGroup(agg, tableSchema, stats).map { case (fs, vs) =>
        Result(StructType(fs), Seq(vs), descr)
      }
    } else {
      // grouped: every grouping expression must be a plain reference to
      // a schema column with a parseable partition cell on EVERY file
      val gfields = agg.groupByExpressions.toSeq.map {
        case ref: NamedReference if ref.fieldNames.length == 1 =>
          tableSchema.fields.find(_.name == ref.fieldNames()(0))
        case _ => None
      }
      if (gfields.exists(_.isEmpty)) return None
      val gcols = gfields.flatten
      // the agg-field schema must exist even when every group is empty;
      // evaluating over ALL stats also pre-declines shapes no group
      // could answer (wrong type, missing entries)
      val shape = evalGroup(agg, tableSchema, stats).getOrElse(return None)._1
      // partition cells are a DIRECTORY property (the k=v path), so
      // parse them once per directory, not once per file — at 10⁶
      // files / 100 partitions that is 100 path parses instead of a
      // million of driver wall (BENCH_NOTES round 10). Under the
      // summary fast path `units` is already one synthetic entry per
      // directory, so this group-by is the identity there.
      val keyed = units.groupBy(_._1.getPath.getParent).toSeq
        .map { case (_, members) =>
          val cells = ScbfPartitions.partValues(
            members.head._1.getPath, tableSchema, partitionRoots)
          // typed cell parse shared with the SPJ split keys
          // (ScbfPartitions.parseCell): -0.0 normalized, NaN declined
          val key = gcols.map(c =>
            cells.get(c.name).flatMap(ScbfPartitions.parseCell(c.dataType, _)))
          if (key.exists(_.isEmpty)) return None // stray dir / foreign cell
          (key.map(_.get), members.map(_._2))
        }
      val rows = keyed.groupBy(_._1).toSeq.flatMap { case (key, members) =>
        val gStats = members.flatMap(_._2)
        // keepers (0-row files) do not make a group: SQL groups only
        // exist where rows do
        if (gStats.map(_.rows).sum == 0L) None
        else evalGroup(agg, tableSchema, gStats) match {
          case Some((_, vs)) => Some(key ++ vs)
          case None          => return None // one unanswerable group → full scan
        }
      }
      Some(Result(
        StructType(gcols.map(c => StructField(c.name, c.dataType, nullable = false)) ++ shape),
        rows,
        s"group by ${gcols.map(_.name).mkString(", ")}: $descr"))
    }
  }

  /** All aggregate expressions evaluated over one set of file stats
   * (the whole table, or one partition-value group). */
  private def evalGroup(
      agg: Aggregation,
      tableSchema: StructType,
      stats: Seq[ScbfStats.FileStats]): Option[(Seq[StructField], Seq[Any])] = {
    val totalRows = stats.map(_.rows).sum
    val live = stats.filter(_.rows > 0)
    val fields = agg.aggregateExpressions.toSeq.map(f => evalOne(f, tableSchema, live, totalRows))
    if (fields.exists(_.isEmpty)) None
    else Some(fields.flatten.unzip)
  }

  private def evalOne(
      func: AggregateFunc,
      schema: StructType,
      live: Seq[ScbfStats.FileStats],
      totalRows: Long): Option[(StructField, Any)] = func match {

    case _: CountStar =>
      Some((StructField("count(*)", LongType, nullable = false), totalRows))

    case c: Count if !c.isDistinct =>
      c.column() match {
        // COUNT(col): no nulls in SCBF → rows. COUNT(<non-null literal>)
        // (Spark's spelling of count(lit(1))) counts every row too.
        case ref: NamedReference if ref.fieldNames.length == 1 &&
            schema.fieldNames.contains(ref.fieldNames()(0)) =>
          Some((StructField(s"count(${ref.fieldNames()(0)})", LongType, nullable = false),
            totalRows))
        case lit: org.apache.spark.sql.connector.expressions.Literal[_]
            if lit.value != null =>
          Some((StructField("count(lit)", LongType, nullable = false), totalRows))
        case _ => None
      }

    case m: Min => minMax(m.column(), schema, live, isMin = true)
    case m: Max => minMax(m.column(), schema, live, isMin = false)

    case s: Sum if !s.isDistinct =>
      column(s.column(), schema).collect {
        case f if f.dataType == IntegerType =>
          // every live file must carry an exact recorded sum
          val sums = live.map(_.cols.get(f.name).flatMap(_.sum))
          if (sums.exists(_.isEmpty)) return None
          try {
            val total = sums.flatten.foldLeft(0L)(Math.addExact)
            (StructField(s"sum(${f.name})", LongType, nullable = true),
              if (live.isEmpty) null else total)
          } catch { case _: ArithmeticException => return None }
      }

    case _ => None // Avg, distinct, UDAFs, GeneralAggregateFunc: not answerable
  }

  private def minMax(
      col: Expression,
      schema: StructType,
      live: Seq[ScbfStats.FileStats],
      isMin: Boolean): Option[(StructField, Any)] =
    column(col, schema).flatMap { f =>
      f.dataType match {
        case IntegerType | DoubleType =>
          // a live file missing the entry (NaN suppression) → fall back
          val ranges = live.map(_.cols.get(f.name))
          if (ranges.exists(_.isEmpty)) None
          else {
            val bounds = ranges.flatten.map(r => if (isMin) r.min else r.max)
            val d: Any =
              if (bounds.isEmpty) null
              else {
                val b = if (isMin) bounds.min else bounds.max
                if (f.dataType == IntegerType) b.toInt else b
              }
            val name = s"${if (isMin) "min" else "max"}(${f.name})"
            Some((StructField(name, f.dataType, nullable = true), d))
          }
        case StringType =>
          // utf8 bounds are SOMETIMES the exact extrema: the sidecar
          // flags a bound that fit whole under the truncation cap
          // (ScbfStats.strRange). Serve MIN/MAX(string) when the
          // WINNING bound is exact — recorded mins never exceed true
          // mins, so the smallest recorded min, when exact, IS the
          // global minimum (symmetrically for max); the short-string
          // case (codes, labels, categories) answers zero-data-open,
          // long strings keep declining to the scan.
          val ranges = live.map(_.strCols.get(f.name))
          if (ranges.exists(_.isEmpty)) None
          else {
            val rs = ranges.flatten
            if (rs.isEmpty)
              Some((StructField(s"${if (isMin) "min" else "max"}(${f.name})",
                f.dataType, nullable = true), null))
            else {
              val winner =
                if (isMin) rs.reduce((a, b) =>
                  if (ScbfStats.cmp(a.min, b.min) < 0) a
                  else if (ScbfStats.cmp(a.min, b.min) > 0) b
                  else if (a.exactMin) a else b)
                else if (rs.exists(_.max.isEmpty)) return None
                else rs.reduce((a, b) =>
                  if (ScbfStats.cmp(a.max.get, b.max.get) > 0) a
                  else if (ScbfStats.cmp(a.max.get, b.max.get) < 0) b
                  else if (a.exactMax) a else b)
              val exact = if (isMin) winner.exactMin else winner.exactMax
              if (!exact) None
              else {
                val bytes = if (isMin) winner.min else winner.max.get
                Some((StructField(s"${if (isMin) "min" else "max"}(${f.name})",
                  f.dataType, nullable = true),
                  org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)))
              }
            }
          }
        case _ => None
      }
    }

  /** The schema field a pushed column expression names, when it is a
   * plain single-part reference. */
  private def column(e: Expression, schema: StructType): Option[StructField] = e match {
    case ref: NamedReference if ref.fieldNames.length == 1 =>
      schema.fields.find(_.name == ref.fieldNames()(0))
    case _ => None
  }
}
