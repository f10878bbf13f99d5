package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Session extension registering graft's native functions AND the
 * maintenance SQL surface:
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
 *   spark.sql("SELECT cosine_sim(a, b) FROM t")
 *   spark.sql("OPTIMIZE corpus CLUSTER BY (doc_id) FILES 2")
 *   spark.sql("VACUUM corpus RETAIN 24 HOURS")
 * }}}
 * DataFrame callers don't need the extension — `GraftFunctions.cosineSim`
 * builds the expression directly, and `ScbfMaintenance` is the API
 * twin of the OPTIMIZE/VACUUM statements ([[graft.plans.GraftSqlParser]]).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlBuilders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // `_file_path` is batch-only: Spark's DSv2 STREAMING column pruning
    // never forwards metadata columns to the scan (the analyzer binds
    // the attribute, but the micro-batch reader is only ever told the
    // data columns), so the reader would produce narrower batches than
    // the plan expects and crash deep in codegen. Fail the shape at
    // ANALYSIS instead, with the workaround in the message. Batch
    // reads — where the pruning contract does carry metadata columns —
    // are untouched.
    ext.injectCheckRule(_ => plan =>
      plan.foreach { node =>
        val streamingScbf = node.isInstanceOf[
            org.apache.spark.sql.catalyst.streaming.StreamingRelationV2] &&
          node.asInstanceOf[org.apache.spark.sql.catalyst.streaming.StreamingRelationV2]
            .table.isInstanceOf[graft.sources.ScbfTable]
        if (streamingScbf && node.output.exists(a =>
            a.name == graft.sources.ScbfDataSource.FilePathCol &&
              a.metadata.contains("__metadata_col"))) {
          throw new graft.scbf.ScbfFormatException(
            "the _file_path metadata column is batch-only: Spark's streaming " +
              "column pruning does not forward metadata columns to the scan. " +
              "Read the directory in BATCH for lineage, or join the stream to " +
              "a batch lineage snapshot on the table's key.")
        }
      })
  }
}
