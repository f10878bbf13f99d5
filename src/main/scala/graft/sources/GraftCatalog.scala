package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.scbf.ScbfFormatException

/**
 * A lean DSv2 catalog for SCBF tables — `TableCatalog` +
 * `FunctionCatalog` + `SupportsNamespaces`:
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
 *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
 *   spark.sql("CREATE TABLE graft.db.docs (doc_id INT, body STRING) USING scbf " +
 *     "PARTITIONED BY (bucket(32, doc_id))")
 * }}}
 *
 * Why it exists (beyond session-catalog tables, which keep working):
 * the `bucket(n, col)` partition transform only reaches
 * storage-partitioned joins when Spark can RESOLVE the transform to a
 * V2 function — and the resolution rule
 * (V2ScanPartitioningAndOrdering) looks the function up in the
 * relation's OWN catalog. The session catalog has no `bucket`
 * function, so a bucketed layout there can never report a usable
 * key-grouping; this catalog serves [[GraftBucketFunction]] — the
 * exact function the writer routes with — and two co-bucketed fact
 * tables join with ZERO exchanges (q58; at 100 TB the single largest
 * network cost a co-bucketed layout can delete).
 *
 * Metadata model, deliberately minimal: a table IS its directory
 * under the warehouse (`warehouse/<ns…>/<name>`), holding a
 * `.graft.table.json` sidecar with the schema DDL and the
 * partitioning (identity column names and `bucket(n,col)` strings).
 * No metastore process, no extra state to keep in sync — the same
 * directory-is-truth principle as the partition layer — and every
 * data file stays reference-readable (the sidecar is dot-prefixed,
 * invisible to listings).
 */
class GraftCatalog extends TableCatalog with FunctionCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def conf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(throw new ScbfFormatException(
      s"GraftCatalog '$name' needs spark.sql.catalog.$name.warehouse=<directory>"))
    warehouse = new Path(wh)
  }

  override def name(): String = catalogName

  /** Identifier/namespace parts become warehouse DIRECTORY names, and
   * dropTable/dropNamespace recursively delete at the computed path —
   * so a quoted part containing a path separator or `..` must be
   * rejected HERE, before it can resolve (and delete) outside the
   * warehouse. Dot-prefixed names are reserved for sidecars/logs. */
  private def checkParts(parts: Seq[String]): Unit = parts.foreach { p =>
    if (p.isEmpty || p.contains('/') || p.contains('\\') ||
        p == ".." || p.startsWith("."))
      throw new ScbfFormatException(
        s"invalid graft-catalog name part '$p': parts map to warehouse " +
          "directory names, so path separators, '..' and '.'-prefixed " +
          "names are not allowed")
  }

  private def dirOf(ident: Identifier): Path = {
    checkParts(ident.namespace.toSeq :+ ident.name)
    (ident.namespace.toSeq :+ ident.name).foldLeft(warehouse)((d, p) => new Path(d, p))
  }

  /** The directory a not-yet-created table WOULD own — pre-create
   * guards (SHALLOW CLONE's stray-content checks) resolve through
   * this; [[tableDirectory]] keeps the exists check for surfaces that
   * require a live table. */
  def plannedTableDirectory(ident: Identifier): Path = dirOf(ident)

  /** The table's root directory — `DESCRIBE HISTORY` resolves through
   * this to read the discovery log without loading the table. */
  def tableDirectory(ident: Identifier): Path = {
    val dir = dirOf(ident)
    if (!dir.getFileSystem(conf).exists(metaOf(dir)))
      throw new NoSuchTableException(ident)
    dir
  }

  private def nsDir(ns: Array[String]): Path = {
    checkParts(ns.toSeq)
    ns.foldLeft(warehouse)((d, p) => new Path(d, p))
  }

  private def metaOf(dir: Path): Path = new Path(dir, GraftCatalog.MetaFile)

  // ---- TableCatalog ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val fs = warehouse.getFileSystem(conf)
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace.toSeq)
    fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && fs.exists(metaOf(s.getPath)))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    try metaOf(dirOf(ident)).getFileSystem(conf).exists(metaOf(dirOf(ident)))
    catch { case scala.util.control.NonFatal(_) => false }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(metaOf(dir))) throw new NoSuchTableException(ident)
    val (schema, transforms) = GraftCatalog.readMeta(fs, metaOf(dir))
    new ScbfTable(Seq(dir.toString), schema, conf, transforms,
      new CaseInsensitiveStringMap(Map("path" -> dir.toString).asJava))
  }

  /** SQL time travel — `SELECT … FROM cat.db.t TIMESTAMP AS OF <ts>`.
   * Spark hands the resolved timestamp in MICROseconds since epoch;
   * the discovery log's version chain is millisecond-stamped, so we
   * floor to millis and load a read-only rendering of the table whose
   * every scan replays the chain (ScbfDiscovery.filesAsOf — same
   * refusal contract as the `asOfTimestamp` read option, which this
   * lifts into SQL). Writes and row-level SQL against the travelled
   * relation refuse loudly (the past is immutable by construction). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(metaOf(dir))) throw new NoSuchTableException(ident)
    val (schema, transforms) = GraftCatalog.readMeta(fs, metaOf(dir))
    val millis = Math.floorDiv(timestamp, 1000L)
    new ScbfTable(Seq(dir.toString), schema, conf, transforms,
      new CaseInsensitiveStringMap(Map(
        "path" -> dir.toString,
        "asOfTimestamp" -> millis.toString).asJava))
  }

  /** `VERSION AS OF n` — n indexes the CURRENT commit chain (the
   * discovery log's name-sorted deltas, oldest = 0; the mapping
   * `DESCRIBE HISTORY tbl COMMITS` shows), resolved to the state after
   * that commit via its max entry timestamp and served by the same
   * TIMESTAMP AS OF machinery — so `VERSION AS OF n` ≡
   * `TIMESTAMP AS OF (that commit's ts)`, refusals included.
   * Honesty limits, each loud or documented: ordinals are indices into
   * the current chain, so compaction RENUMBERS them (it folds
   * pre-history into one `fold` snapshot = version 0, the state after
   * the last folded commit — per-commit boundaries inside the fold are
   * gone, and out-of-range versions refuse naming the valid range);
   * timestamps remain the durable axis for anything written down.
   * Non-numeric versions refuse with that guidance. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val n = version.trim.toIntOption.getOrElse(throw new ScbfFormatException(
      s"VERSION AS OF '$version' on ${name()}.$ident: versions are the " +
        "integer ordinals DESCRIBE HISTORY <tbl> COMMITS shows (current " +
        "commit chain, oldest = 0). For a durable reference use " +
        "TIMESTAMP AS OF <timestamp> — exact for any point whose files " +
        "still exist (see README 'Time travel')."))
    val dir = dirOf(ident)
    if (!dir.getFileSystem(conf).exists(metaOf(dir)))
      throw new NoSuchTableException(ident)
    val ts = ScbfDiscovery.versionTs(
      dir.getFileSystem(conf).makeQualified(dir), conf, n)
    loadTable(ident, ts * 1000L) // the millis-stamped chain in micros
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    // validate up front — identity + at most one trailing bucket(n, int)
    ScbfPartitions.partitionCols(partitions, schema)
    ScbfPartitions.bucketSpec(partitions, schema)
    ScbfDataSource.sparkToScbf(schema) // representable types only
    val dir = dirOf(ident)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(metaOf(dir))) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(dir)
    GraftCatalog.writeMeta(fs, metaOf(dir), schema, partitions)
    loadTable(ident)
  }

  /** Schema/partitioning changes are table rewrites in a frozen format
   * (see README "Schema evolution") — same decline as the session
   * catalog's guided ALTER path. Property-only changes are accepted
   * as a no-op (this catalog stores none). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val structural = changes.exists {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => false
      case _ => true
    }
    if (structural) throw new ScbfFormatException(
      s"ALTER TABLE on graft-catalog table $ident: schema changes are table " +
        "rewrites in the frozen SCBF format. Use a session-catalog table " +
        "(USING scbf LOCATION …) for the managed ADD/DROP/RENAME COLUMN " +
        "statements, or the successor-rewrite recipe (README 'Schema evolution').")
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(metaOf(dir))) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new ScbfFormatException(
      "RENAME TABLE is not supported by the graft catalog: the table IS its " +
        "warehouse directory. Create the new name over the same data with " +
        "CREATE TABLE ... USING scbf LOCATION, or move the directory and " +
        "re-create.")

  // ---- SupportsNamespaces (directories under the warehouse) ----

  override def listNamespaces(): Array[Array[String]] = {
    val fs = warehouse.getFileSystem(conf)
    if (!fs.exists(warehouse)) return Array.empty
    fs.listStatus(warehouse).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val fs = warehouse.getFileSystem(conf)
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace.toSeq)
    fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !fs.exists(metaOf(s.getPath)))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (try nsDir(namespace).getFileSystem(conf).exists(nsDir(namespace))
      catch { case scala.util.control.NonFatal(_) => false })

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    nsDir(namespace).getFileSystem(conf).mkdirs(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new ScbfFormatException("graft-catalog namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) false
    else {
      if (!cascade && fs.listStatus(d).nonEmpty)
        throw new ScbfFormatException(
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(d, true)
    }
  }

  // ---- FunctionCatalog: the bucket transform's V2 function ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftUnboundBucket
    else throw new NoSuchFunctionException(ident)
}

object GraftCatalog {

  /** Dot-prefixed: invisible to data-file listings and reference tooling. */
  val MetaFile = ".graft.table.json"

  private[sources] def writeMeta(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      schema: StructType, partitions: Array[Transform]): Unit = {
    val parts = partitions.toSeq.map {
      case t if t.name == "identity" => "\"" +
        t.references.head.fieldNames.head + "\""
      case t if t.name == "bucket" =>
        val col = t.references.head.fieldNames.head
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.asInstanceOf[Number].intValue()
        }.get
        s""""bucket($n,$col)""""
      case t => throw new ScbfFormatException(s"unsupported transform: $t")
    }
    val json =
      s"""{"schemaDdl":${jsonStr(schema.toDDL)},"partitioning":[${parts.mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes(UTF_8)) finally out.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val BucketRe = """bucket\((\d+),(\w+)\)""".r

  private[sources] def readMeta(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): (StructType, Array[Transform]) = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(buf, UTF_8))
    val schema = StructType.fromDDL(node.get("schemaDdl").asText())
    val parts = (0 until node.get("partitioning").size()).map { i =>
      node.get("partitioning").get(i).asText() match {
        case BucketRe(n, col) => Expressions.bucket(n.toInt, col): Transform
        case col              => Expressions.identity(col): Transform
      }
    }
    (schema, parts.toArray)
  }
}

/** The catalog's `bucket` function — Spark resolves the table's
 * `bucket(n, col)` transform against it when planning
 * storage-partitioned joins. MUST stay in lockstep with
 * [[ScbfPartitions.bucketId]] (the writer's routing): they are one
 * function or SPJ would co-locate wrong buckets. */
object GraftUnboundBucket extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, intCol): floorMod(value, numBuckets) — the SCBF " +
      "bucket-transform routing function"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(1).dataType == IntegerType,
      s"graft bucket expects (numBuckets INT, value INT), got $inputType")
    GraftBucketFunction
  }
}

object GraftBucketFunction extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket.int"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    ScbfPartitions.bucketId(input.getInt(1), input.getInt(0))
}
