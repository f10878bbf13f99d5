package graft.tools
import org.apache.spark.sql.SparkSession

/** Same-session interleaved A/B for storage-partitioned joins: ingest
 * documents ONCE into two co-partitioned SCBF tables bucketed by
 * `db = doc_id % B` (the explicit-bucket-column recipe for
 * high-cardinality keys), then time ONLY the join+agg with
 * `graft.spj.enabled` alternating per pair — so box drift hits both
 * variants equally and the measured delta is exactly the two
 * exchanges SPJ deletes.
 *
 * Usage: Test/runMain graft.tools.SpjAB <sfDir> <pairs> [buckets] [mult] */
object SpjAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val pairs = args(1).toInt
    val buckets = if (args.length > 2) args(2).toInt else 32
    // derived-scale multiplier (ScaleProbe convention): explode the
    // corpus mult× with unique doc_ids so the join is shuffle-bound,
    // not fixed-overhead-bound, at the measured size
    val mult = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // partition keys (db) are a strict subset of the join keys
      // (db, doc_id); Spark accepts the partial co-partition only
      // with this off
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/tmp/graft_spj_ab"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    Seq("spjab_f", "spjab_d").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()
    src.createOrReplaceTempView("spjab_src0")
    spark.sql(s"""SELECT doc_id + $n * m AS doc_id, text, n_chars
      FROM spjab_src0
      LATERAL VIEW explode(sequence(0, ${mult - 1})) AS m""")
      .createOrReplaceTempView("spjab_src")
    spark.sql("CREATE TABLE spjab_f (doc_id INT, n_chars INT, db INT) " +
      s"USING scbf PARTITIONED BY (db) LOCATION '$base/f'")
    spark.sql(s"""INSERT INTO spjab_f
      SELECT /*+ REPARTITION($buckets, db) */ CAST(doc_id AS INT),
        CAST(n_chars AS INT), CAST(doc_id % $buckets AS INT) AS db
      FROM spjab_src""")
    spark.sql("CREATE TABLE spjab_d (doc_id INT, score INT, db INT) " +
      s"USING scbf PARTITIONED BY (db) LOCATION '$base/d'")
    spark.sql(s"""INSERT INTO spjab_d
      SELECT /*+ REPARTITION($buckets, db) */ CAST(doc_id AS INT),
        CAST(LENGTH(text) AS INT), CAST(doc_id % $buckets AS INT) AS db
      FROM spjab_src""")

    // per-bucket aggregate: a global COUNT would add the inherent
    // SinglePartition exchange on both variants and muddy the pin
    val q = """SELECT f.db, COUNT(*) AS cnt, SUM(f.n_chars + d.score) AS s
      FROM spjab_f f JOIN spjab_d d ON f.db = d.db AND f.doc_id = d.doc_id
      GROUP BY f.db"""
    def one(v: String): (Double, Long, Boolean) = {
      spark.conf.set(graft.GraftConf.SpjEnabled, v)
      val t0 = System.nanoTime()
      val df = spark.sql(q)
      val cnt = df.collect().map(_.getLong(1)).sum
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, cnt, df.queryExecution.executedPlan.toString.contains("Exchange"))
    }
    val (_, c0, ex0) = one("true"); val (_, c1, ex1) = one("false") // warm both
    require(c0 == c1, s"on/off row counts diverge: $c0 vs $c1")
    require(!ex0 && ex1, s"plan shapes wrong: spj-on hasExchange=$ex0, spj-off hasExchange=$ex1")
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    (1 to pairs).foreach { i =>
      val (ta, _, _) = one("true"); val (tb, _, _) = one("false")
      as += ta; bs += tb
      println(f"[spj-ab] pair $i: spj=on ${ta}%.3f s | spj=off ${tb}%.3f s")
    }
    println(f"[spj-ab] rows=$c0 buckets=$buckets")
    println(f"[spj-ab] MIN  spj=on ${as.min}%.3f s | spj=off ${bs.min}%.3f s | ratio ${bs.min / as.min}%.2fx")
    println(f"[spj-ab] MEAN spj=on ${as.sum / as.size}%.3f s | spj=off ${bs.sum / bs.size}%.3f s")
    spark.stop()
  }
}
