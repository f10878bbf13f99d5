package graft

import org.apache.spark.sql.SparkSession

/** Scale knobs for the ANN/LSH operators. The defaults are tuned for
 * the test corpus; a 100 TB deployment scales them (kCells ~ √N for
 * IVF cell balance, plane bits ~ log N to keep expected per-bucket
 * pair counts bounded — see the call sites in DedupQueries).
 *
 * Resolution order: Spark session conf (runtime override, engine side
 * only) → JVM system property → built-in default. Oracle SQL
 * generation has no session, so it resolves from the system property:
 * to move the engine AND its generated oracle together (the
 * single-source contract the correctness gate relies on), set the
 * SYSTEM PROPERTY; a session-conf-only override tunes the engine when
 * the oracle isn't in play. */
object GraftConf {

  /** d11's IVF cell count (default 16). */
  val AnnKCells = "graft.ann.kcells"
  /** d6's hyperplane sign bits per LSH table (default 10). */
  val LshBits = "graft.lsh.bits"
  /** d8's hyperplane sign bits per near-dup LSH table (default 12). */
  val LshD8Bits = "graft.lsh.d8.bits"
  /** t14's base per-source token budget (default 400; each source gets
   * base × its 1/2/3× mixture-weight ladder). */
  val MixtureBudget = "graft.mixture.budget"

  def int(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).orElse(sys.props.get(key)).fold(dflt)(_.trim.toInt)

  /** Session-less resolution (oracle generation). */
  def int(key: String, dflt: Int): Int =
    sys.props.get(key).fold(dflt)(_.trim.toInt)
}
