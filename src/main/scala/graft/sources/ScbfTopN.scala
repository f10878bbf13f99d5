package graft.sources

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.types._

/**
 * Top-k file pruning for `ORDER BY col LIMIT k` over an SCBF scan
 * (DSv2 `SupportsPushDownTopN`, partial push — Spark keeps its Sort +
 * Limit, so planning extra files is always safe).
 *
 * The sound bound: take the files whose stats carry an UPPER bound on
 * the sort column, in ascending upper-bound order, until their summed
 * row counts reach k; call the last such upper bound B. Those files
 * alone prove ≥ k rows with value ≤ B exist, so any file whose LOWER
 * bound exceeds B cannot contribute to the k smallest rows and is
 * excluded. Everything else — including every file without trusted
 * stats or without a usable bound — plans. Descending order is the
 * mirror image (swap the bounds, reverse the order).
 *
 * Soundness under the stored bounds' slack: a numeric entry is exact;
 * a utf8 MIN is a truncated prefix (≤ the true min, so `lo > B` still
 * implies every true value > B) and a utf8 MAX is the widened
 * truncation (≥ the true max, so counting a file's rows as "≤ its
 * stored max" stays valid); a NaN-bearing double column has no entry
 * at all (NaN sorts above every double in Spark — bounds ignoring it
 * would be unsound, absence just keeps the file). Only the FIRST sort
 * key is used: rows beyond B on the first key are strictly beaten by
 * ≥ k rows regardless of tie-breakers. SCBF stores no nulls, so null
 * ordering never matters.
 */
private[sources] object ScbfTopN {

  def prune(
      kept: Seq[FileStatus],
      lookup: ScbfStats.Lookup,
      field: StructField,
      desc: Boolean,
      k: Int): Seq[FileStatus] = {

    // (file, rows, lo, hi) with bounds as comparable values, or bounds
    // absent when the file has no trusted/usable stats for the column
    final case class Entry[T](f: FileStatus, rows: Long, lo: Option[T], hi: Option[T])

    def run[T](entries: Seq[Entry[T]])(ord0: Ordering[T]): Seq[FileStatus] = {
      // DESC top-k == ASC top-k under the reversed order with bounds swapped
      val (es, iord) =
        if (desc) (entries.map(e => Entry(e.f, e.rows, e.hi, e.lo)), ord0.reverse)
        else (entries, ord0)
      val bounded = es.filter(_.hi.isDefined).sortBy(_.hi.get)(iord)
      var acc = 0L
      var b: Option[T] = None
      val it = bounded.iterator
      while (acc < k && it.hasNext) {
        val e = it.next()
        acc += e.rows
        b = e.hi
      }
      if (acc < k) es.map(_.f) // stats cannot prove k rows: no pruning
      else {
        val bound = b.get
        es.filter(e => !e.lo.exists(lo => iord.gt(lo, bound))).map(_.f)
      }
    }

    field.dataType match {
      case IntegerType | DoubleType =>
        run(kept.map { f =>
          val st = lookup.stats(f.getPath, f.getLen)
          val r = st.flatMap(_.cols.get(field.name))
          Entry(f, st.map(_.rows).getOrElse(0L), r.map(_.min), r.map(_.max))
        })(Ordering.Double.TotalOrdering)
      case StringType =>
        run(kept.map { f =>
          val st = lookup.stats(f.getPath, f.getLen)
          val r = st.flatMap(_.strCols.get(field.name))
          Entry(f, st.map(_.rows).getOrElse(0L), r.map(_.min), r.flatMap(_.max))
        })((a: Array[Byte], b: Array[Byte]) => ScbfStats.cmp(a, b))
      case _ => kept
    }
  }
}
