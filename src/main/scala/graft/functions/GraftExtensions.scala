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
  }
}
