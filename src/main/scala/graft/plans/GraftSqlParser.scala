package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.sources.ScbfMaintenance

/**
 * SQL surface for SCBF table MAINTENANCE — the last piece of the
 * "a SQL-only user needs nothing from `graft.*`" contract. DELETE,
 * UPDATE and MERGE ride Spark's own grammar (SupportsDelete /
 * SupportsRowLevelOperations); OPTIMIZE and VACUUM have no vanilla
 * Spark syntax, so this parser (injected via
 * [[graft.functions.GraftExtensions]]) recognizes the Delta-shaped
 * statements and delegates EVERYTHING else untouched:
 *
 * {{{
 *   OPTIMIZE tbl [FILES n]                          -- bin-pack compaction
 *   OPTIMIZE tbl CLUSTER BY (c1[, c2…]) [FILES n]   -- range-cluster
 *   OPTIMIZE tbl ZORDER  BY (c1, c2[, …]) [FILES n] -- z-order
 *   VACUUM tbl [RETAIN h HOURS]                     -- temp/orphan sweep
 * }}}
 *
 * The commands resolve the table through the session catalog (provider
 * must be `scbf`; the DDL location is the table root) and route to the
 * same maintenance engine the API exposes: partitioned tables sweep
 * per partition with root-log re-announcement
 * ([[ScbfMaintenance.clusterTable]]/zorderTable), flat directories
 * rewrite in one snapshot-scoped pass. Recognition is whole-statement
 * anchored — a SELECT mentioning the word OPTIMIZE never detours.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)\s+(CLUSTER|ZORDER)\s+BY\s*\(\s*([^)]+?)\s*\)(?:\s+FILES\s+(\d+))?\s*;?\s*""".r
  // plain bin-packing compaction, no BY clause (Delta's un-ZORDERed
  // OPTIMIZE) — matched AFTER the BY form so it can't shadow it
  private val OptimizePlainRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)(?:\s+FILES\s+(\d+))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r

  private[plans] def maintenancePlan(sql: String): Option[LogicalPlan] = sql match {
    case OptimizeRe(tbl, kind, cols, files) =>
      val colNames = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(colNames.nonEmpty, s"OPTIMIZE needs at least one column: $sql")
      Some(GraftOptimizeCommand(tbl,
        zorder = kind.equalsIgnoreCase("ZORDER"), colNames,
        Option(files).map(_.toInt).getOrElse(1)))
    case OptimizePlainRe(tbl, files) =>
      Some(GraftOptimizeCommand(tbl, zorder = false, Seq.empty,
        Option(files).map(_.toInt).getOrElse(1)))
    case VacuumRe(tbl, hours) =>
      Some(GraftVacuumCommand(tbl, Option(hours).map(_.toLong * 3600 * 1000)))
    case _ => None
  }

  /** Session-catalog resolution: the table's SCBF root directory and
   * whether it is hive-partitioned. Fails loudly for non-scbf tables —
   * maintenance must never sweep a foreign format's directory. */
  private[plans] def resolveScbfTable(
      spark: SparkSession, table: String): (String, Boolean) = {
    val parts = table.split('.')
    val ti = parts.length match {
      case 2 => TableIdentifier(parts(1), Some(parts(0)))
      // fully-qualified session-catalog names resolve too; a foreign
      // catalog fails with the real name in the message instead of a
      // mangled single-part lookup
      case 3 =>
        require(parts(0).equalsIgnoreCase("spark_catalog"),
          s"OPTIMIZE/VACUUM support session-catalog tables only, got $table")
        TableIdentifier(parts(2), Some(parts(1)))
      case _ => TableIdentifier(table)
    }
    val meta = spark.sessionState.catalog.getTableMetadata(ti)
    require(meta.provider.exists(_.equalsIgnoreCase("scbf")),
      s"$table is not an SCBF table (provider=${meta.provider.getOrElse("?")}): " +
        "OPTIMIZE/VACUUM apply to USING scbf tables only")
    (new org.apache.hadoop.fs.Path(meta.location).toString,
      meta.partitionColumnNames.nonEmpty)
  }
}

/** `OPTIMIZE tbl CLUSTER|ZORDER BY (cols) [FILES n]` — snapshot-scoped
 * rewrite via [[ScbfMaintenance]]; partitioned tables sweep every
 * partition (per-partition passes, root-log re-announce). Returns the
 * number of original files folded into the rewrite (the maintenance
 * API's own accounting). */
case class GraftOptimizeCommand(
    table: String, zorder: Boolean, cols: Seq[String], files: Int)
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("files_rewritten", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (dir, partitioned) = GraftSqlParser.resolveScbfTable(spark, table)
    val produced =
      (zorder, cols.isEmpty, partitioned) match {
        // no BY clause: plain bin-packing compaction
        case (false, true, false)  => ScbfMaintenance.compact(spark, dir, files)
        case (false, true, true)   => ScbfMaintenance.compactTable(spark, dir, files)
        case (false, false, false) => ScbfMaintenance.cluster(spark, dir, cols, files)
        case (false, false, true)  => ScbfMaintenance.clusterTable(spark, dir, cols, files)
        case (true, _, false)      => ScbfMaintenance.zorder(spark, dir, cols, files)
        case (true, _, true)       => ScbfMaintenance.zorderTable(spark, dir, cols, files)
      }
    Seq(Row(produced.size))
  }
}

/** `VACUUM tbl [RETAIN h HOURS]` — sweep aged dot-temps and orphan
 * sidecars from the table root and every partition directory holding
 * data. Returns (temps, orphans) removed. */
case class GraftVacuumCommand(table: String, olderThanMs: Option[Long])
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("temps_removed", IntegerType, nullable = false)(),
    AttributeReference("orphans_removed", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (dir, _) = GraftSqlParser.resolveScbfTable(spark, table)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    // EVERY table directory, data-holding or not: the partitioned
    // root's own litter and a crashed write's temp-only partition
    // directory both need sweeping, so the data-holding filter the
    // rewrite walk applies (pruneDirs) is exactly wrong here
    val dirs = graft.sources.ScbfPartitions.allDirs(root, conf)
    var temps = 0
    var orphans = 0
    dirs.foreach { d =>
      val (t, o) = olderThanMs match {
        case Some(ms) => ScbfMaintenance.vacuum(spark, d.toString, ms)
        case None     => ScbfMaintenance.vacuum(spark, d.toString)
      }
      temps += t; orphans += o
    }
    Seq(Row(temps, orphans))
  }
}
