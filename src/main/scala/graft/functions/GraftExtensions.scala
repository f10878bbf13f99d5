package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Session extension registering graft's native functions for SQL use:
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
 *   spark.sql("SELECT cosine_sim(a, b) FROM t")
 * }}}
 * DataFrame callers don't need the extension — `GraftFunctions.cosineSim`
 * builds the expression directly.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlBuilders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}
