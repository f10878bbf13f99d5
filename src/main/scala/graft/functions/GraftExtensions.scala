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
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      CosineSimilarity.info,
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }))
  }
}
