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
    // the session rides along for the ALTER ... COLUMN interception's
    // parse-time provider probe (scbf tables only; anything else —
    // including unresolvable names — delegates untouched)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(delegate, Option(session)))
    // `_file_path` is batch-only: Spark's DSv2 STREAMING column pruning
    // never forwards metadata columns to the scan (the analyzer binds
    // the attribute, but the micro-batch reader is only ever told the
    // data columns), so the reader would produce narrower batches than
    // the plan expects and crash deep in codegen. Fail the shape at
    // ANALYSIS instead, with the workaround in the message. Batch
    // reads — where the pruning contract does carry metadata columns —
    // are untouched.
    // MERGE ON-clause `_file_path` guidance: Spark resolves the ON
    // condition against a subplan WITHOUT metadata output, so
    // `ON ... t._file_path = ...` can never resolve — but the stock
    // failure is a generic UNRESOLVED_COLUMN deep in analysis. This
    // post-hoc rule catches the still-unresolved attribute on an SCBF
    // merge target and names the supported spelling (the per-clause
    // condition, which resolves against the rewrite read relation).
    ext.injectResolutionRule(_ =>
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(
            plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
            : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
          // AddMetadataColumns RESOLVES `t._file_path` inside MERGE's
          // ON clause (the target does expose it), and Spark's DML
          // rewrite — which runs BEFORE extension rules ever see a
          // MergeIntoTable — then applies the ON condition to the
          // SOURCE side, where the metadata column cannot exist. The
          // stock failure is a generic MISSING_ATTRIBUTES much later.
          // Detect the doomed shape on the rewritten plan: a node
          // under ReplaceData whose missingInput contains the resolved
          // metadata attribute. Precise by construction: only the
          // target's metadata attribute carries __metadata_col, the
          // rewrite builds its target read relation complete (so the
          // supported per-clause spelling never has a missing input),
          // and a source subtree can never heal the reference.
          val C = graft.sources.ScbfDataSource.FilePathCol
          plan.foreach {
            case rd: org.apache.spark.sql.catalyst.plans.logical.ReplaceData =>
              // the doomed Filter lives in the group-filter SUBQUERY
              // expression, which plain foreach never enters
              (rd +: rd.subqueriesAll).foreach(_.foreach { n =>
                if (n.missingInput.exists(a => a.name.equalsIgnoreCase(C) &&
                    a.metadata.contains("__metadata_col")))
                  throw new graft.scbf.ScbfFormatException(
                    "MERGE cannot reference _file_path in the ON clause: " +
                      "Spark's rewrite applies the ON condition to the source " +
                      "side, where the metadata column cannot exist. Move the " +
                      "predicate into the WHEN clause instead — e.g. WHEN " +
                      "MATCHED AND t._file_path = '…' THEN UPDATE ... — which " +
                      "resolves against the rewrite read relation.")
              })
            case _ => ()
          }
          plan
        }
      })
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
