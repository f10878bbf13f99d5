package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftConf

/**
 * Deduplication + similarity-search operators for large-scale
 * training-data pipelines, over the `documents` and `embeddings` tables.
 *
 * Scale design: everything is expressed as joins/aggregations over
 * exploded shingles or LSH buckets — the exhaustive O(n²) pairwise
 * comparison appears ONLY in the DuckDB oracles. The Spark side always
 * goes through candidate generation (minhash band buckets, hyperplane
 * sign buckets) followed by exact verification of candidates, which is
 * the shape that survives 100 TB: candidates are a tiny fraction of all
 * pairs, and every step is a shuffle on a key, never a cross join
 * (except against a broadcast-size query set).
 */
object DedupQueries {

  import Ops.{t, dmean, spread}

  /** Word trigram shingles of the single-space-tokenized text (with
   * duplicates — set semantics come from a row-level distinct after the
   * explode, which runs in codegen, unlike array_distinct). */
  private val ShingleExpr =
    """filter(transform(w, (x, i) ->
      |  IF(i <= size(w) - 3,
      |     concat(x, '_', element_at(w, i + 2), '_', element_at(w, i + 3)),
      |     NULL)), y -> y IS NOT NULL)""".stripMargin

  /** documents ∪ mutated copies (every 'value ' token removed,
   * doc_id + 100000) — a deterministic planted near-duplicate set so the
   * dedup operators have real work on the synthetic corpus. */
  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "value ", "").as("text")))
  }

  private[operators] val CorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |         regexp_replace(text, 'value ', '', 'g') AS text
      |  FROM documents)""".stripMargin

  private val ShinglesSql =
    s"""$CorpusSql,
       |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |         generate_series(1, greatest(len(w) - 2, 0)),
       |         i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) s
       |       FROM tok)""".stripMargin

  // d2's MinHash sketch size / band count are GraftConf knobs
  // (graft.minhash.{hashes,bands}, defaults 48 / 24 → 2 rows per band:
  // recall ≥ 1 - (1-s²)^24). The band/row trade is the recall-vs-
  // candidate-volume dial a 100 TB deployment tunes; the oracle is the
  // EXACT all-pairs Jaccard, so any banding that reaches full recall on
  // the corpus hash-matches it (the gate doubles as a recall test of
  // the configured banding). The staged pair graph re-keys on both
  // knobs (see d2Pairs) so a knob change can never serve a stale graph.
  private def minHashConfig(s: SparkSession): (Int, Int) = {
    val hashes = GraftConf.int(s, GraftConf.MinHashHashes, 48)
    val bands = GraftConf.int(s, GraftConf.MinHashBands, 24)
    require(bands > 0 && hashes % bands == 0,
      s"graft.minhash.bands ($bands) must divide graft.minhash.hashes ($hashes)")
    (hashes, bands)
  }

  /** SQL twin of simhashSignatures, shared by the d3/d10 oracles. Bit 63
   * is recombined as Long.MinValue (the signed spelling of 1<<63) so the
   * signature stays a plain BIGINT in both engines with no intermediate
   * sum ever leaving [-2^63, 2^63): the positive terms total < 2^63 and
   * the single negative term is the lower bound itself. */
  private lazy val SimhashSigsSql: String = {
    val bitSums = ((0 until 32).map(j =>
      s"SUM(CASE WHEN (hv_lo >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j") ++
      (32 until 64).map(j =>
        s"SUM(CASE WHEN (hv_hi >> ${j - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"))
      .mkString(",\n  ")
    val recombine = ((0 until 63).map(j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)") :+
      s"(CASE WHEN b63 > 0 THEN ${Long.MinValue} ELSE 0 END)").mkString(" + ")
    s"""$CorpusSql,
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) t FROM corpus),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT hv_hi,
       |             ('0x' || substr(md5(t), 9, 8))::BIGINT hv_lo FROM tok),
       |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $recombine AS simhash FROM bits)""".stripMargin
  }

  /** 64-bit SimHash per corpus doc — shared by d3 (the signature
   * surface) and d10 (near-dup pairs over the signatures). The token
   * hash family is the graft.span.hash knob: md5 (default — taken as
   * two 32-bit md5 halves, bits 32-63 from hex chars 1-8, bits 0-31
   * from chars 9-16, so no per-token value ever exceeds the
   * signed-BIGINT range in either engine; see SimhashSigsSql for the
   * bit-63 recombination) replicates in the DuckDB oracle, which the
   * gate needs because SimHash bit VALUES drive the signature;
   * xxhash64 (production — the two halves of one xxhash64(t)) keeps
   * the locality property with one long-mix per token instead of a
   * digest + two hex parses, the per-token map-side cost at
   * 100 TB. */
  private def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val (hiExpr, loExpr) =
      if (GraftConf.spanHash(s) == "md5")
        ("CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)",
          "CAST(conv(substr(md5(t), 9, 8), 16, 10) AS BIGINT)")
      else
        ("shiftrightunsigned(xxhash64(t), 32)",
          "xxhash64(t) & 4294967295")
    val tok = corpus(s, dir)
      .repartition(spread(s), col("doc_id")) // single-file input: spread the hash work
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("hv_hi", expr(hiExpr))
      .withColumn("hv_lo", expr(loExpr))
    // all 64 bit-sums + the sign recombination in ONE
    // TypedImperativeAggregate (bit-identical to 64 separate
    // sum(when(...)) aggs — whose 64-slot HashAggregate janino compile
    // dominated cold time, the d2/MinHashSketch lesson)
    tok.groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions
        .simhashSketch(col("hv_hi"), col("hv_lo")).as("simhash"))
  }

  /** d4's document-frequency cap: a gram appearing in more than this many
   * documents of one source carries no Jaccard discrimination but
   * generates DF² rows in the gram self-join — the one quadratic in that
   * pipeline. Capping DF bounds per-gram join fan-out at any corpus size;
   * the cap applies identically to intersections and cardinalities (and
   * in the oracle SQL), so similarity is consistently defined over
   * discriminative grams. */
  private val MaxGramDf = 64

  /** d14's paragraph stand-in: non-overlapping windows of this many
   * tokens. Small enough that the synthetic ~60-token docs produce
   * several chunks each (so the planted near-duplicates share chunks
   * and the operator has real work); a real corpus would split on
   * '\n\n' instead and nothing downstream changes. */
  private[operators] val ParagraphTokens = 16

  /** d16's duplicated-span window length (tokens, stride 1) — the
   * minimum repeated-passage length worth flagging; 8 matches t10's
   * contamination-gram convention. */
  private[graft] val DupSpanTokens = 8

  /** d22's winnowing window DEFAULT (consecutive window-hash positions
   * per selection) — the shuffle-reduction/guarantee trade: selected
   * fingerprint density is 2/(W+1) and the exactness guarantee covers
   * spans of ≥ DupSpanTokens + W − 1 tokens. Deployments widen it via
   * the graft.winnow.window knob (GraftConf: system property moves
   * engine AND oracle together; requireOracleConsistency guards
   * divergence). */
  private[graft] val WinnowWindow = 4

  /** The knob-resolved winnow window for the ORACLE side (session-less
   * system-property resolution — the GraftConf contract). */
  private def winnowW: Int = {
    val w = GraftConf.int(GraftConf.WinnowW, WinnowWindow)
    require(w >= 1, s"graft.winnow.window must be >= 1, got $w")
    w
  }


  /** d6's integer hyperplane tables (4 tables × 10 sign bits), seeded
   * per dim — the same cross-engine trick as [[d8Planes]]: over
   * integer-quantized components every plane·vector dot is exact in
   * both engines, so the bucket assignment has no float-sign ambiguity
   * and d6 keeps an exact DuckDB oracle despite being an approximate-
   * candidate operator. (Gaussian-vs-uniform entries don't matter for
   * LSH quality — only the plane's direction does.) */
  /** Seeded integer-entry hyperplane tables shared by d6 and d8 — ONE
   * generator so the quantization contract (entry range, and with it
   * the < 2⁵³ exactness bound on the dots) cannot drift between the
   * two operators' oracle twins. */
  private def intPlanes(seed: Long, tables: Int, bits: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)((rnd.nextInt(2001) - 1000).toDouble)
  }

  /** bits is the d6 scale knob (GraftConf.LshBits): ~log N keeps
   * expected per-bucket candidates bounded as the corpus grows. */
  private[operators] def lshPlanes(dim: Int, bits: Int = 10): Array[Array[Array[Double]]] =
    intPlanes(12345L, tables = 4, bits = bits, dim)

  /** Hyperplane-LSH ANN core (d6): bucket-join candidate generation +
   * exact verification + salted top-k, over any (vec_id, e:
   * array<double>) corpus. `queryPred` selects the query rows from the
   * corpus. Parameterized so AnnRecallSpec can run it over a corpus
   * with planted near-duplicates — the quantitative recall anchor
   * (candidate GENERATION is approximate even though, with the integer
   * planes, the generated set is bit-reproducible cross-engine). */
  private[operators] def annLshTopK(corpus: DataFrame, queryPred: Column,
      k: Int = 3, bits: Int = 10): DataFrame = {
    // embedding dimensionality from the data, not hardcoded — planes
    // are seeded, so the bucketing stays deterministic per dim
    val dim = corpus.select(size(col("e"))).head().getInt(0)
    val planes = lshPlanes(dim, bits)
    // bucketing as a codegen Expression (HyperplaneBuckets): the
    // per-row Scala UDF it replaces boxed the embedding into a Seq on
    // the hot path; the planes ride along as one plan-level reference
    // object, not per-row state. Buckets come from the integer-
    // quantized vector; scoring uses the original doubles.
    val emb = corpus
      .withColumn("q", expr("transform(e, x -> CAST(floor(x * 1000.0D) AS DOUBLE))"))
      .withColumn("buckets",
        graft.functions.GraftFunctions.hyperplaneBuckets(col("q"), planes))
      .select(col("vec_id"), col("e"), explode(col("buckets")).as("bucket"))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("bucket"))
    val cand = emb.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qe", "vec_id", "e").distinct()
    // salted hierarchical top-k over bucket candidates (see d5): the
    // candidate set is already sub-linear, but a hot bucket would still
    // funnel one query's candidates into one task without the salt.
    scoreTopK(cand, k)
  }

  /** Shared ranking tail of both ANN cores: exact cosine over the
   * candidate set, then the salted hierarchical top-k. One definition
   * so the ranking contract (tie-break, output columns) cannot drift
   * between the LSH and IVF paths. */
  private def scoreTopK(cand: DataFrame, k: Int): DataFrame = {
    val scored = cand
      .withColumn("sim", graft.functions.GraftFunctions.cosineSim(col("qe"), col("e")))
    Ops.saltedTopK(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("vec_id").asc), col("vec_id"), k, "rank")
      .select("query_id", "rank", "vec_id")
  }

  /** d8's deterministic near-duplicate perturbation (sim ≈ 0.999 to the
   * original) — shared with AnnRecallSpec's planted-corpus anchor so
   * the spec always plants exactly what d8 detects. */
  private[operators] val PerturbExpr =
    "transform(e, (x, i) -> x * (1.0D + 0.01D * ((i % 7) - 3)))"

  /** d8's integer hyperplane tables (4 tables × 12 sign bits × dim 64).
   *
   * Integer entries are the cross-engine trick: embedding components are
   * quantized to integers (floor(x·1000), IEEE-identical in both
   * engines), so every plane·vector dot is a sum of integer-valued
   * doubles bounded far below 2⁵³ — EXACT in any summation order, in
   * either engine. The bucket assignment therefore has no
   * floating-point sign ambiguity at all, which is what lets an
   * approximate-candidate operator keep an exact DuckDB oracle twin
   * (the same literals are embedded into the generated SQL below).
   * Gaussian-vs-uniform entries don't matter for LSH quality — only
   * the direction of the plane does. */
  /** bits is the d8 scale knob (GraftConf.LshD8Bits): ~log N keeps
   * expected per-bucket pair counts bounded as the corpus grows. The
   * generated oracle derives from the SAME plane array (single-source:
   * set the JVM property to move both sides together). */
  private[operators] def d8Planes(bits: Int = 12): Array[Array[Array[Double]]] =
    intPlanes(987654321L, tables = 4, bits = bits, dim = 64)

  /** Oracle-side spelling of [[HyperplaneBuckets]]: one SQL expression
   * per table computing `t<<32 + Σ 2^b·[dot_b > 0]` (key < 2³², so +
   * is |). Mirrors the expression's strict `> 0` sign convention —
   * exact because the dots are integer-valued. Shared by the d8 and
   * d6 oracles. */
  private def bucketExprsSql(planes: Array[Array[Array[Double]]]): Seq[String] =
    planes.toIndexedSeq.zipWithIndex.map { case (table, ti) =>
      val bits = table.toIndexedSeq.zipWithIndex.map { case (plane, b) =>
        val dot = plane.toIndexedSeq.zipWithIndex
          .map { case (h, j) => s"q[${j + 1}]*(${h.toLong})" }.mkString("+")
        s"(CASE WHEN $dot > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"(${ti.toLong << 32} + ($bits))"
    }

  /** Shared CTE prefix of the d8/d15 oracles: the planted vector
   * corpus, integer-quantized hyperplane buckets, bucket-join
   * candidates, and the exact-cosine-verified pair set (`vpairs` over
   * `vcorpus`). Mirrors the Spark d8 pipeline stage for stage —
   * including the bit-width knob, resolved from the same plane
   * generator. */
  private def d8PairsSql(bits: Int): String =
    s"""base AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
       |pert AS (SELECT vec_id + 100000 AS vec_id,
       |  list_transform(generate_series(1, len(e)),
       |    j -> e[j] * (1.0 + 0.01 * (((j - 1) % 7) - 3))) e
       |  FROM base),
       |vcorpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
       |qz AS (SELECT vec_id, list_transform(e, x -> floor(x * 1000.0)) q
       |       FROM vcorpus),
       |bk AS (SELECT vec_id,
       |         unnest([${bucketExprsSql(d8Planes(bits)).mkString(",\n           ")}]) bucket
       |       FROM qz),
       |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb
       |         FROM bk a JOIN bk b
       |           ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |vpairs AS (SELECT va, vb
       |           FROM cand
       |           JOIN vcorpus ca ON ca.vec_id = va
       |           JOIN vcorpus cb ON cb.vec_id = vb
       |           WHERE list_cosine_similarity(ca.e, cb.e) >= 0.8)""".stripMargin

  /** IVF ANN core (d11): Lloyd's-trained coarse quantizer + probed
   * cells + salted top-k, over any (vec_id, e: array<double>) corpus.
   * Training is DataFrame aggregations; assignment is one codegen'd
   * CentroidSims call (the matrix rides as a plan reference object, no
   * UDF); new centroids are decimal-exact means, so the trained index
   * is bit-reproducible at any parallelism. Only kCells×dim doubles
   * ever reach the driver (the model, between iterations); the corpus
   * never does. */
  private[operators] def annIvfTopK(corpusDf: DataFrame, queryPred: Column,
      k: Int = 3, kCells: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    // defensive projection: callers may pass a corpus with extra or
    // reordered columns; everything below (incl. the positional seed
    // collect) assumes exactly (vec_id, e)
    val emb = corpusDf.select(col("vec_id"), col("e"))
    // deterministic seeds: the kCells vectors with the smallest
    // md5-derived id hash (md5, unlike xxhash64, exists in DuckDB too,
    // which is what lets the d11 oracle reproduce the seed order);
    // a corpus smaller than kCells trains with what it has
    val seedHash =
      expr("CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    var cents: Array[Array[Double]] = emb
      .orderBy(seedHash, col("vec_id")).limit(kCells)
      .collect().map(_.getAs[Seq[Double]]("e").toArray)
    val nCells = cents.length
    require(nCells > 0, "annIvfTopK: empty corpus")
    // all-centroid similarities in ONE codegen expression (the centroid
    // matrix is a plan reference object — see CentroidSims for why the
    // kCells-literal cosine_sim + CASE argmax spelling was replaced);
    // argmax via array_position (first occurrence) keeps the first-wins
    // tiebreak deterministic
    def withCell(df: DataFrame, c: Array[Array[Double]]): DataFrame = df
      .withColumn("__sims", graft.functions.GraftFunctions.centroidSims(col("e"), c))
      .withColumn("cell",
        (array_position(col("__sims"), array_max(col("__sims"))) - 1).cast("int"))
      .drop("__sims")
    for (_ <- 1 to iters) {
      val means = withCell(emb, cents)
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(dmean(col("x"), 12).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray }
      cents = Array.tabulate(nCells)(i => means.getOrElse(i, cents(i))) // empty cell keeps seed
    }
    val assigned = withCell(emb, cents)
    // probe list: top-nprobe cells per query — bounded at queries×nCells
    // rows, so a plain window is safe here (not a scale funnel)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("qsim").desc, col("cell").asc)
    val probes = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        posexplode(graft.functions.GraftFunctions.centroidSims(col("e"), cents))
          .as(Seq("cell", "qsim")))
      .withColumn("pr", row_number().over(wq)).filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("vec_id"), col("e"))
    scoreTopK(cand, k)
  }

  // ---------------------------------------------------------------------
  // Staged pair graphs. Each of the three pair pipelines (d2 MinHash,
  // d10 SimHash, d8 embedding-LSH) feeds SEVERAL operators: its own
  // pair-report query plus downstream clustering (d13, d15) and the
  // cross-method agreement report (d18). A real pipeline materializes
  // the pair graph once and fans it out; re-deriving it per consumer is
  // a second full corpus pass at 100 TB. The `*PairsPlan` builders are
  // the unstaged, plan-lockable pipelines; the `*Pairs` wrappers stage
  // them behind ONE localCheckpoint per (session, sfDir) via Ops.staged,
  // so whichever consumer runs first pays materialization and the rest
  // read executor-local blocks. Plan-shape locks target the builders
  // (the checkpoint truncates lineage — consumers see an ExistingRDD).
  // ---------------------------------------------------------------------

  /** d2's MinHash-LSH pair pipeline, unstaged (see [[d2Pairs]]). */
  private[operators] def d2PairsPlan(s: SparkSession, dir: String): DataFrame = {
      // Fully count-based: one exploded (doc_id, shingle) relation drives
      // everything — minhash aggregation, band buckets, and candidate
      // verification. No array columns are built, shuffled, or
      // intersected (array_distinct/array_intersect run interpreted and
      // were the measured bottleneck); every stage is codegen'd
      // aggregation/join on small rows.
      //
      // Exact-duplicate pre-collapse: k identical copies of a text share
      // ALL band keys, so banding the raw corpus generates k²
      // candidate pairs per duplicate cluster — quadratic exactly on the
      // duplicate-heavy corpora dedup targets. Collapse to one
      // representative per distinct text first (d1's hash-groupBy
      // shape), run LSH over unique texts only, then re-expand pairs
      // through the duplicate groups at the end: cross-group member
      // pairs inherit the rep pair's counts (Jaccard depends only on the
      // text), and within-group member pairs are exact duplicates
      // (inter = union = |shingle set|). Expansion is pure output
      // materialization — the quadratic no longer touches the shingle
      // joins.
      // one shuffle on the text hash assigns every row its group
      // representative; no join needed for either the member list or the
      // unique-text corpus
      val withRep = corpus(s, dir)
        .repartition(spread(s), col("doc_id")) // single-file input: spread the work
        // group hash deliberately md5, not xxhash64: a same-session
        // interleaved A/B (ABQuery, round 9) measured the xxhash64+
        // length variant 10% SLOWER over 4/4 pairs (2.25 vs 1.95 s
        // warm at sf0.1) — the rep-assignment stage is not
        // hash-digest-bound, and md5's 128 bits make false merges a
        // non-concern
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .withColumn("rep", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      // ONE checkpoint of the rep assignment serves both downstream
      // consumers (optimization r15): checkpointing only `members`
      // made `uniq`'s subtree re-run the whole corpus scan + repartition
      // + md5-window a second time (profiled: a duplicate 34-task
      // ~230 ms pass at sf0.1 — a full corpus pass at scale). Text
      // bytes are pinned ONLY for group representatives (the when()
      // below): non-rep members carry a NULL, so the checkpoint holds
      // the unique-text corpus `ex` reads anyway plus two ids per row.
      val repd = withRep
        .select(col("rep"), col("doc_id"),
          when(col("doc_id") === col("rep"), col("text")).as("text"))
        .localCheckpoint()
      val members = repd.select(col("rep"), col("doc_id"))
      val uniq = repd.filter(col("doc_id") === col("rep"))
        .select(col("rep").as("doc_id"), col("text"))
      // the exploded distinct shingle relation drives minhashing, cards,
      // and both verification joins (4 consumers): materialize once.
      // Shingles are collapsed to their xxhash64 up front — every
      // downstream shuffle/join carries an 8-byte long instead of a
      // ~30-byte trigram string, and the minhash family xxhash64(i, h)
      // over hashed shingles is as valid as one over the strings. A
      // 64-bit collision (≈2⁻⁶⁴ per shingle pair) could in principle
      // perturb a count; the oracle gate would catch it.
      val ex = uniq
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(ShingleExpr)).as("xs"))
        .select(col("doc_id"), xxhash64(col("xs")).as("x"))
        .distinct() // shingle SET semantics via codegen hash aggregate
        .localCheckpoint()
      val cards = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      // all numHashes minhashes in ONE TypedImperativeAggregate (bit-
      // identical to that many separate min(xxhash64(i, x)) aggs, same
      // partial-merge): one long[] buffer and one tight hash loop per
      // row, instead of an n-slot HashAggregate whose janino compile
      // dominated cold-start
      val (numHashes, numBands) = minHashConfig(s)
      val rowsPerBand = numHashes / numBands
      val mh = ex.groupBy(col("doc_id"))
        .agg(graft.functions.GraftFunctions.minhashSketch(col("x"), numHashes).as("mhs"))
      // band key = xxhash64 of the band's rowsPerBand minhashes: the
      // hottest remaining shuffle carries an 8-byte long instead of a
      // ~40-byte "m1:m2:…" string. A 2⁻⁶⁴ band-key collision can only
      // ADD a candidate pair, and exact verification below discards it.
      val bands = mh.select(col("doc_id"), posexplode(array(
        (0 until numBands).map(j =>
          xxhash64((0 until rowsPerBand).map(k =>
            element_at(col("mhs"), j * rowsPerBand + k + 1)): _*)): _*
      )).as(Seq("band_idx", "band_key")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // exact verification: shared-shingle counts for candidate pairs only
      val inter = cand
        .join(ex.select(col("doc_id").as("doc_a"), col("x")), "doc_a")
        .join(ex.select(col("doc_id").as("doc_b"), col("x")), Seq("doc_b", "x"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter_cnt"))
      // cards scales with the corpus — no broadcast hint; AQE broadcasts
      // when it is actually small.
      val repPairs = inter
        .join(cards.select(col("doc_id").as("doc_a"), col("c").as("ca")), "doc_a")
        .join(cards.select(col("doc_id").as("doc_b"), col("c").as("cb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
          (col("ca") + col("cb") - col("inter_cnt")).as("union_cnt"))
        .filter(col("inter_cnt") * 10 >= col("union_cnt") * 6)
      // re-expand: cross-group pairs carry the rep pair's counts; member
      // ids may interleave across groups, so re-order with least/greatest
      val crossExp = repPairs
        .join(members.select(col("rep").as("doc_a"), col("doc_id").as("ma")), "doc_a")
        .join(members.select(col("rep").as("doc_b"), col("doc_id").as("mb")), "doc_b")
        .select(least(col("ma"), col("mb")).as("doc_a"),
          greatest(col("ma"), col("mb")).as("doc_b"),
          col("inter_cnt"), col("union_cnt"))
      // within-group pairs are J=1; the inner join on cards drops
      // zero-shingle texts, exactly as the all-pairs oracle does
      val withinExp = members.as("p").join(members.as("q"),
          col("p.rep") === col("q.rep") && col("p.doc_id") < col("q.doc_id"))
        .select(col("p.rep").as("grp"),
          col("p.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"))
        .join(cards.select(col("doc_id").as("grp"), col("c")), "grp")
        .select(col("doc_a"), col("doc_b"),
          col("c").as("inter_cnt"), col("c").as("union_cnt"))
      crossExp.unionByName(withinExp)
  }

  /** d5's exact brute-force top-k, unstaged (see [[d5TopK]]).
   * Query set is broadcast-size; corpus side streams — at scale this
   * is a broadcast-nested-loop over the fact table, the standard
   * exact-scoring shape. Ranks only: similarity values stay engine-
   * internal so float formatting can't leak into the comparison. */
  private[operators] def d5TopKPlan(s: SparkSession, dir: String): DataFrame = {
    // cast (codegen) + native cosine_sim expression (codegen): the
    // interpreted aggregate/zip_with lambda formulation this replaces
    // boxed every element three times per pair.
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", graft.functions.GraftFunctions.cosineSim(col("qe"), col("e")))
    // Hierarchical top-k (q6's salted pattern): a plain per-query_id
    // window funnels every scored corpus row through ≤|queries| tasks —
    // straggler sorts at scale. Salt on the corpus vec_id, take the
    // local top-3 per (query_id, salt) — any global top-3 row has ≤2
    // rows ahead of it in its own bucket, so it always survives — then
    // rank the ≤ 3×32 candidates per query. Identical output, bounded
    // task size at any corpus scale.
    Ops.saltedTopK(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("vec_id").asc), col("vec_id"), 3, "rank")
      .select("query_id", "rank", "vec_id")
  }

  /** d5's exact ranked list (query_id, rank, vec_id), staged once per
   * (session, sfDir): consumed by the d5 query and the d21 quality
   * report. */
  private[operators] def d5TopK(s: SparkSession, dir: String): DataFrame =
    Ops.staged(s, dir, "d5_topk")(d5TopKPlan(s, dir))

  /** d6's LSH-bucketed top-k, unstaged (see [[d6TopK]]): 10 hyperplane
   * sign bits → bucket; candidates share a bucket with the query under
   * at least one of 4 independent bucketings (see annLshTopK). */
  private[operators] def d6TopKPlan(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // the generated oracle embeds dim-64 plane literals: any other
    // dim must fail loudly here, not as a silent oracle divergence
    val dim = emb.select(size(col("e"))).head().getInt(0)
    require(dim == 64, s"d6 oracle is generated for dim=64 embeddings; data has dim=$dim")
    annLshTopK(emb, col("vec_id") < 5,
      bits = GraftConf.int(s, GraftConf.LshBits, 10))
  }

  /** d6's ranked list, staged; the key carries the bit-width knob. */
  private[operators] def d6TopK(s: SparkSession, dir: String): DataFrame = {
    val bits = GraftConf.int(s, GraftConf.LshBits, 10)
    Ops.staged(s, dir, s"d6_topk_b$bits")(d6TopKPlan(s, dir))
  }

  /** d11's IVF top-k, unstaged (see [[d11TopK]]): k-means cells bound
   * the exact search to nprobe/kCells of the corpus (see annIvfTopK).
   * Training and search are deterministic and mirrored step-for-step
   * in SQL (ivfOracleSql) — hash-gated, not rows-only. */
  private[operators] def d11TopKPlan(s: SparkSession, dir: String): DataFrame =
    annIvfTopK(
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e")),
      col("vec_id") < 5,
      kCells = GraftConf.int(s, GraftConf.AnnKCells, 16))

  /** d11's ranked list, staged; the key carries the kCells knob. */
  private[operators] def d11TopK(s: SparkSession, dir: String): DataFrame = {
    val cells = GraftConf.int(s, GraftConf.AnnKCells, 16)
    Ops.staged(s, dir, s"d11_topk_c$cells")(d11TopKPlan(s, dir))
  }

  /** The d2 pair graph (doc_a, doc_b, inter_cnt, union_cnt), staged
   * once per (session, sfDir): consumed by the d2 pair report and the
   * d18 agreement report. The staging key carries BOTH banding knobs —
   * a knob change must re-materialize, never serve the previous
   * config's graph (the d8_pairs_b$bits discipline). */
  private[operators] def d2Pairs(s: SparkSession, dir: String): DataFrame = {
    val (h, b) = minHashConfig(s)
    Ops.staged(s, dir, s"d2_pairs_h${h}_b$b")(d2PairsPlan(s, dir))
  }

  // ---- SimHash near-duplicate pairs (exact, via pigeonhole bands) ----
    // hamming(a, b) ≤ 3 over a 64-bit signature means at most 3 of the
    // 4 disjoint 16-bit chunks differ — so every qualifying pair shares
    // at least one chunk verbatim. Candidates come from a chunk-value
    // equi-join (a shuffle on small ints, no all-pairs work), then the
    // exact bit_count(xor) verification keeps only true pairs: unlike
    // MinHash banding this is EXACT by construction, at any scale.
    // Chunk width trades the recall-guaranteed radius (k chunks ⟹
    // hamming ≤ k-1) against bucket fan-out; 4×16 bits is the
    // Manku-style web-dedup layout — 65,536 bucket values per chunk
    // position, so random signatures collide at 1/65536 per chunk and
    // expected false candidates stay ~4·N²/2¹⁸ instead of the ~N²/128
    // the previous 32-bit/4×8 split produced. The arithmetic >> on the
    // signed signature sign-extends, but & 65535 keeps exactly the
    // original 16 bits in both engines.
  private[operators] def d10PairsPlan(s: SparkSession, dir: String): DataFrame = {
      val sig = simhashSignatures(s, dir)
      val chunks = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          expr(s"(simhash >> ${16 * c}) & 65535")): _*)).as(Seq("chunk_idx", "chunk_val")))
      chunks.as("a").join(chunks.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sa"), col("b.simhash").as("sb"))
        .distinct() // a pair can share several chunks
        .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
  }

  /** The d10 pair graph (doc_a, doc_b, hamming), staged once per
   * (session, sfDir): consumed by the d10 pair report, d13's
   * clustering, and the d18 agreement report. The staging key carries
   * the resolved hash family — a knob change must never be served a
   * graph staged under the other family (the d2/d8 staging rule). */
  private[operators] def d10Pairs(s: SparkSession, dir: String): DataFrame =
    Ops.staged(s, dir, s"d10_pairs_${GraftConf.spanHash(s)}")(d10PairsPlan(s, dir))

  /** d8's hyperplane-LSH pair pipeline, unstaged (see [[d8Pairs]]).
   * Candidate generation via d6's hyperplane sign buckets (4 tables ×
   * 12 bits over integer-quantized components — see d8Planes for why
   * the integer dots make the bucketing bit-exact in both engines),
   * then exact cosine ≥ 0.8 verification of candidates only. Unlike
   * the label-cell version this replaces, bucket occupancy shrinks as
   * the corpus diversifies and the bit width is the scale knob (bits ~
   * log N keeps expected per-bucket pairs bounded), so no join grows
   * quadratically with corpus size. A deterministic perturbed copy of
   * each vector is planted (vec_id + 100000) so the operator has real
   * near-dups to find (measured recall 1.0 on the planted pairs: the
   * perturbation flips a sign bit only when |dot| is within 1% of 0);
   * the 0.8 threshold sits in a ~0.3-wide gap of the similarity
   * distribution, far from any engine-rounding ambiguity. */
  private[operators] def d8PairsPlan(s: SparkSession, dir: String): DataFrame = {
    val bits = GraftConf.int(s, GraftConf.LshD8Bits, 12)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // the plane tables (and the generated oracle) are dim-64: a corpus
    // with any other dim must fail HERE, loudly, not as a downstream
    // hash mismatch that looks like an engine bug
    val dim = emb.select(size(col("e"))).head().getInt(0)
    require(dim == 64, s"d8 planes/oracle are generated for dim=64 embeddings; data has dim=$dim")
    val perturbed = emb.select((col("vec_id") + 100000).as("vec_id"),
      expr(PerturbExpr).as("e"))
    val corpus = emb.unionByName(perturbed)
    // Spark floor(double) yields BIGINT — cast back so the quantized
    // vector stays array<double> for the codegen bucket expression
    val bucketed = corpus
      .withColumn("q", expr("transform(e, x -> CAST(floor(x * 1000.0D) AS DOUBLE))"))
      .select(col("vec_id"),
        explode(graft.functions.GraftFunctions.hyperplaneBuckets(col("q"), d8Planes(bits)))
          .as("bucket"))
    // candidates are (long, long) id pairs only — the 64-double vectors
    // never ride through the bucket join; verification re-joins them
    // by vec_id (the scalable shape: small rows in the hot shuffle)
    val cand = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct() // a pair can share buckets in several tables
    cand
      .join(corpus.select(col("vec_id").as("vec_a"), col("e").as("ea")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("e").as("eb")), "vec_b")
      .filter(graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")) >= 0.8)
      .select(col("vec_a"), col("vec_b"))
  }

  /** The d8 pair graph (vec_a, vec_b), staged once per (session,
   * sfDir): consumed by the d8 pair report and d15's keeper
   * selection. */
  private[operators] def d8Pairs(s: SparkSession, dir: String): DataFrame = {
    // the staging key carries the resolved knob: a bit-width change
    // must never be served a stale graph staged under another width
    val bits = GraftConf.int(s, GraftConf.LshD8Bits, 12)
    Ops.staged(s, dir, s"d8_pairs_b$bits")(d8PairsPlan(s, dir))
  }

  /** Stride-1 window hashes (doc_id, idx, h) over the corpus — the
   * shared upstream of d16 (span detection) and d17 (span removal).
   * Window key = 8-byte xxhash64 of the L-token window (the d2/d4
   * convention): every downstream aggregate/join carries a long, not a
   * 32-char md5 hex; the oracles hash the window STRING with md5, so
   * dup sets agree modulo a 2⁻⁶⁴ collision — caught by the gate.
   * Deliberately NOT staged, unlike the pair graphs: this explode is a
   * map-side ~L× blowup of the token count generated straight off the
   * corpus scan (no shuffle), so re-deriving it per consumer costs one
   * cheap narrow pass, while materializing it would pin an L×-corpus
   * staging table — the opposite cost profile to the pair graphs
   * (small outputs of expensive shuffling pipelines). */
  private def spanWindows(s: SparkSession, dir: String): DataFrame = {
    val L = DupSpanTokens
    // Window key = xxhash64 over the window's L per-token hashes, not
    // over a rebuilt window STRING: the naive form (slice + concat_ws +
    // hash per window) re-touches every token L times and allocates a
    // ~50-byte string per window — the explode is the most
    // data-proportional stage of d16/d17, so its constant matters at
    // 100 TB. Hashing each token ONCE and then combining L fixed-width
    // longs per window does O(1) string work per token instead of O(L),
    // and the whole thing runs as ONE codegen kernel
    // (functions.TokenWindowHashes — bit-identical to the interpreted
    // transform/xxhash64 HOF chain it replaces, the WinnowFingerprints
    // rationale). Key equality still ⟺ window equality modulo a 2⁻⁶⁴
    // collision (same contract as before: the oracles hash the window
    // string with md5 and the gate would catch a disagreement).
    Ops.spreadIfNarrow(s, corpus(s, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.tokenWindowHashes(col("w"), L)))
      .toDF("doc_id", "idx", "h")
  }

  /** One row per DUPLICATED window hash — its corpus count crossed 2 —
   * with the first occurrence under the (doc_id, idx) total order.
   * This IS staged (unlike spanWindows): the aggregate shuffles the
   * full ~L×-token window relation — the expensive stage of both d16
   * (detection: needs the duplicated-hash set) and d17 (removal:
   * needs the winners) — while its OUTPUT is one fixed-width row per
   * duplicated hash. Same cost profile as the pair graphs: expensive
   * pipeline, small result, several consumers. */
  private def spanWinners(s: SparkSession, dir: String): DataFrame =
    Ops.staged(s, dir, "span_winners") {
      spanWindows(s, dir).groupBy(col("h"))
        .agg(count(lit(1)).as("c"),
          min(struct(col("doc_id"), col("idx"))).as("w1"))
        .filter(col("c") >= 2)
        .select(col("h"), col("w1.doc_id").as("wdoc"), col("w1.idx").as("widx"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact deduplication: hash-groupBy on full text ----
    "d1_dedup_exact" -> { (s, dir) =>
      corpus(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dup_cnt"))
    },

    // ---- MinHash + LSH near-duplicate pairs ----
    // shingle → minhash sketch → LSH bands (knobs, default 24×2) →
    // band-bucket join for
    // candidates → exact shingle-set verification (integer jaccard test:
    // 10·|A∩B| ≥ 6·|A∪B| ⟺ J ≥ 0.6). The oracle checks ALL pairs, so
    // this doubles as a (deterministic) recall test of the band config.
    // Pipeline: d2PairsPlan; the query serves the STAGED pair graph.
    "d2_minhash_lsh" -> { (s, dir) => d2Pairs(s, dir) },

    // ---- SimHash document signatures (64-bit, md5-derived) ----
    "d3_simhash" -> { (s, dir) => simhashSignatures(s, dir) },

    // ---- SimHash near-duplicate pairs (exact, via pigeonhole bands) ----
    // Pipeline: d10PairsPlan; the query serves the STAGED pair graph.
    "d10_simhash_neardup" -> { (s, dir) => d10Pairs(s, dir) },

    // ---- duplicate-cluster assignment: connected components ----
    // The step a dedup pipeline runs AFTER pair generation: fold the
    // near-dup pair graph (d10's exact hamming≤3 pairs) into clusters
    // and pick one keeper per cluster. Relabel-and-contract rounds:
    // each round every contracted vertex takes the min id over itself
    // and its neighbors, the vertex→cluster map composes through that
    // round's mins, and the EDGE SET is rewritten onto the round's
    // labels (self-loops dropped, duplicates collapsed). Contracting
    // the edges is what kills long chains — plain min-propagation needs
    // diameter rounds (measured 16 on this corpus's hamming graph,
    // whose gradually-mutated docs chain), contraction converges in 6,
    // and the edge table collapses toward one row per unresolved
    // cluster as it goes. Every step is a join/aggregate on (long,
    // long) rows; localCheckpoint truncates the per-round lineage.
    // Termination is edge exhaustion — an exact criterion, not a
    // fixed round budget. Docs with no near-dup pair never enter the
    // iteration (the dedup-graph asymmetry: near-dup docs ≪ corpus)
    // and are unioned back as singleton clusters at the end.
    "d13_dedup_clusters" -> { (s, dir) =>
      val pairs = d10Pairs(s, dir) // the STAGED graph — shared with d10's report

      val lab = Ops.connectedComponents(
          pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
        .select(col("vertex").as("doc_id"), col("component").as("label"))
      // docs with no near-dup pair never enter the iteration (the
      // dedup-graph asymmetry: near-dup docs ≪ corpus) — singleton
      // clusters by construction
      val singletons = corpus(s, dir).select(col("doc_id"))
        .join(lab.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("label"))
      val all = lab.unionByName(singletons)
      val sizes = all.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      all.join(sizes, "label")
        .select(col("doc_id"), col("label").as("cluster_rep"), col("cluster_size"))
    },

    // ---- paragraph-level (sub-document) exact dedup ----
    // The Lee-et-al-style pass a training pipeline runs AFTER doc-level
    // dedup: repeated passages (boilerplate, quoted text) are removed
    // from every occurrence but the globally first. Paragraph boundary
    // here = non-overlapping windows of ParagraphTokens tokens (the
    // synthetic corpus has no newline structure; real corpora would
    // split on '\n\n' and the rest of the pipeline is unchanged).
    // First-wins is a total order (doc_id, idx), so the output is
    // deterministic at any parallelism. Scale shape: the winner per
    // chunk hash is a min(struct) AGGREGATE — map-side partial combine
    // collapses each hash to one row per input partition before the
    // shuffle, and the flagging join on `h` is AQE-skew-splittable.
    // (A row_number window partitioned on `h` would be hash-equivalent
    // but funnels every copy of a hot boilerplate chunk — the very
    // thing this operator exists to remove — through one task's sort;
    // a window partition can't be split, a skewed join partition can.)
    // Then one shuffle back on doc_id to reassemble; rows carry at
    // most ParagraphTokens tokens. No self-join, no pairs.
    "d14_paragraph_dedup" -> { (s, dir) =>
      val c = ParagraphTokens
      val chunks = corpus(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(0, CAST(ceil(size(w) / $c.0) AS INT) - 1),
             |  i -> concat_ws(' ', slice(w, i * $c + 1, $c)))""".stripMargin)))
        .toDF("doc_id", "idx", "chunk")
        // first-wins on the 8-byte xxhash64, not the chunk text: the
        // shuffle key stays fixed-width however long the paragraph is,
        // and the hot aggregate/join carries a long instead of a 32-char
        // md5 hex (the d2/d4 key convention). The oracle groups on the
        // chunk string itself, so results agree modulo a 2⁻⁶⁴ collision
        // — which the oracle gate would catch.
        .withColumn("h", xxhash64(col("chunk")))
      val winners = chunks
        .groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("idx"))).as("w1"))
        .select(col("h"), col("w1.doc_id").as("wdoc"), col("w1.idx").as("widx"))
      chunks.join(winners, "h")
        .withColumn("kept",
          col("doc_id") === col("wdoc") && col("idx") === col("widx"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          // per-doc chunk count is bounded (doc length / ParagraphTokens),
          // so the collect_list is a small in-memory sort, not a funnel
          expr("""concat_ws(' ', transform(
            |  array_sort(collect_list(CASE WHEN kept THEN struct(idx, chunk) END)),
            |  x -> x.chunk))""".stripMargin).as("dedup_text"))
    },

    // ---- exact duplicated-span detection (sub-document, overlapping) ----
    // The rolling-window rendering of Lee et al.'s suffix-array
    // substring dedup: every stride-1 window of DupSpanTokens tokens is
    // hashed; a window whose hash occurs ≥2 times corpus-wide (any doc,
    // including self-repetition) is duplicated, and runs of consecutive
    // duplicated window starts merge into MAXIMAL spans per doc
    // (gaps-and-islands on idx − row_number). Complements d14: d14
    // removes disjoint-chunk repeats cheaply; d16 finds every repeated
    // passage at token granularity regardless of alignment. Scale
    // shape: the stride-1 explode is a bounded L× blowup of the token
    // count (map-side); duplicate detection is a count aggregate +
    // equi-join on the 8-byte hash (the d14 skew lesson — a hot
    // boilerplate hash meets a ONE-ROW dup marker, linear, never
    // pairwise); the islands window partitions on doc_id, bounded by
    // doc length.
    "d16_dup_spans" -> { (s, dir) =>
      val L = DupSpanTokens
      val wins = spanWindows(s, dir)
      // the STAGED winners aggregate, shared with d17 (spanWinners)
      val dup = spanWinners(s, dir).select(col("h"))
      val dw = wins.join(dup, "h").select(col("doc_id"), col("idx"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      val isl = dw.withColumn("grp", col("idx") - row_number().over(wDoc))
      isl.groupBy(col("doc_id"), col("grp"))
        .agg(min(col("idx")).cast("long").as("span_start"),
          (max(col("idx")) + L - 1).cast("long").as("span_end"),
          (max(col("idx")) - min(col("idx")) + L).cast("long").as("span_tokens"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"))
    },

    // ---- exact duplicated-span REMOVAL (detect-then-rewrite) ----
    // The rewrite half of Lee et al.'s substring dedup — d16 detects
    // repeated passages, this operator deletes them from every
    // occurrence but the globally first, composing d16's windows with
    // d14's first-wins + ordered-reassembly machinery. A window whose
    // hash occurs ≥2 times corpus-wide keeps its FIRST occurrence
    // under the total order (doc_id, idx); every token covered by a
    // NON-first duplicated window is dropped; survivors reassemble in
    // order. Scale shape: winner selection is min(struct) — a
    // partial-combined aggregate on the 8-byte window hash (the d14
    // skew lesson: a hot boilerplate window collapses map-side, never
    // through one task's window sort); non-first flagging is the hash
    // equi-join against a ONE-row-per-hash winner marker (linear,
    // never pairwise); the drop set explodes ≤L positions per
    // non-first window (map-side, bounded); the flag join keys on
    // (doc_id, pos) — unique per row, unskewable — and reassembly is
    // d14's bounded per-doc sort.
    "d17_span_dedup" -> { (s, dir) =>
      val L = DupSpanTokens
      val wins = spanWindows(s, dir)
      // the STAGED winners aggregate, shared with d16 (spanWinners)
      val winners = spanWinners(s, dir)
      val nonFirst = wins.join(winners, "h")
        .filter(!(col("doc_id") === col("wdoc") && col("idx") === col("widx")))
        .select(col("doc_id"), col("idx"))
      val dropped = nonFirst
        .select(col("doc_id"), explode(expr(s"sequence(idx, idx + ${L - 1})")).as("pos"))
        .distinct() // overlapping non-first windows cover a token twice
        .withColumn("is_dropped", lit(true))
      val toks = corpus(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tokn")))
      toks.join(dropped, Seq("doc_id", "pos"), "left")
        .withColumn("dropped", coalesce(col("is_dropped"), lit(false)))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
          // per-doc token count bounds the collect_list — a small
          // in-memory sort, not a funnel (the d14 reassembly shape)
          expr("""concat_ws(' ', transform(
            |  array_sort(collect_list(CASE WHEN NOT dropped THEN struct(pos, tokn) END)),
            |  x -> x.tokn))""".stripMargin).as("dedup_text"))
    },

    // ---- winnowed duplicated-span detection (the d16 scale path) ----
    // Schleimer et al.'s winnowing over the d16 window-hash stream: in
    // every run of WinnowWindow consecutive window hashes, only the
    // minimum (leftmost on ties) is SELECTED as a fingerprint, and only
    // selected fingerprints are exploded, shuffled and dup-counted —
    // the rest of the L×-token window relation never leaves the map
    // side. The winnowing theorem makes this exact-by-construction for
    // spans of ≥ L + WinnowWindow − 1 tokens (two occurrences of such a
    // span contain a full shared winnow window, whose minimum hash both
    // select), while shorter duplicates are found opportunistically —
    // the contract a 100 TB substring-dedup pass actually runs under
    // (Lee et al. use 50-token minimums; d16 remains the exact-at-L
    // reference implementation). Selection is ARRAY-DOMAIN (transform /
    // array_min / array_position on the per-doc hash array): no window
    // function, no per-doc shuffle — the only shuffled relation is the
    // ~2/(W+1)-density fingerprint set. Window hashes come from the
    // graft.span.hash knob: md5 (default) because SELECTION must be
    // bit-identical in the DuckDB oracle; xxhash64 is the production
    // family — same plan, same winnowing guarantees, one long-mix per
    // token instead of a digest per window (the dominant map-side cost
    // at 100 TB). Spans group selected duplicated fingerprints
    // ≤ W apart (winnowing guarantees one selection per W window
    // starts, so one duplicated span's fingerprints can never sit
    // further than W apart).
    "d22_winnowed_spans" -> { (s, dir) =>
      val L = DupSpanTokens
      val W = GraftConf.int(s, GraftConf.WinnowW, WinnowWindow)
      val algo = GraftConf.spanHash(s)
      // hashing + selection fused into ONE codegen expression
      // (functions.WinnowFingerprints — the RollingHash rationale: the
      // HOF spelling ran interpreted, building a window string, an md5
      // hex string and a conv() parse per window plus two slices per
      // selection step; the kernel digests straight from token bytes).
      // Value-identical to the HOF chain, which WinnowedSpansSpec
      // still computes independently as the density cross-check.
      val sel = Ops.spreadIfNarrow(s, corpus(s, dir), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= L)
        .select(col("doc_id"), explode(
          graft.functions.GraftFunctions.winnowFingerprints(col("w"), L, W, algo)).as("f"))
        .select(col("doc_id"), col("f.idx").as("idx"), col("f.h").as("h"))
      // dup marker: ONE row per duplicated fingerprint hash (the d14
      // skew lesson — hot boilerplate meets a one-row marker, linear)
      val dup = sel.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("h"))
      val dsel = sel.join(dup, "h").select(col("doc_id"), col("idx"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      val grp = dsel
        .withColumn("f", when(
          col("idx") - lag(col("idx"), 1, -(W + 1)).over(wDoc) > W, 1).otherwise(0))
        .withColumn("grp", sum(col("f")).over(wDoc))
      grp.groupBy(col("doc_id"), col("grp"))
        .agg(min(col("idx")).cast("long").as("span_start"),
          (max(col("idx")) + L - 1).cast("long").as("span_end"),
          count(lit(1)).as("n_fingerprints"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_fingerprints"))
    },

    // ---- pair-graph agreement report (MinHash-Jaccard × SimHash) ----
    // Intrinsic precision cross-check of the two lexical pair
    // generators over the same corpus: d2's verified Jaccard pairs and
    // d10's exact hamming pairs, full-outer-joined on the pair key and
    // bucketed into a (jaccard-decile × hamming) agreement grid —
    // where the methods disagree (-1 rows) is where a pipeline audits
    // thresholds, at any scale, without ground-truth labels. Consumes
    // BOTH staged pair graphs; adds NO pair generation of its own —
    // just one join/aggregate over two small pair sets. jband is
    // integer arithmetic (10·inter div union ∈ [6,10]) so the decile
    // edges are engine-exact.
    "d18_pair_agreement" -> { (s, dir) =>
      val mh = d2Pairs(s, dir).select(col("doc_a"), col("doc_b"),
        expr("inter_cnt * 10 div union_cnt").as("jband"))
      val sh = d10Pairs(s, dir).select(col("doc_a"), col("doc_b"),
        col("hamming").cast("long").as("hamming"))
      mh.join(sh, Seq("doc_a", "doc_b"), "full_outer")
        .groupBy(coalesce(col("jband"), lit(-1L)).as("jband"),
          coalesce(col("hamming"), lit(-1L)).as("hamming"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // ---- incremental exact dedup: a new batch vs the ingested corpus ----
    // The production shape: a pipeline does NOT re-dedup 100 TB per
    // crawl — it dedups the day's increment against a persistent hash
    // index of everything already ingested, plus first-wins within the
    // increment itself. Here the mutated half of the planted corpus
    // (doc_id ≥ 100000) plays the increment and the originals the
    // history; mutated copies of docs that contained no removable token
    // land as exact history hits — the planted cross-batch signal.
    // Scale shape: the history side is just its DISTINCT text hashes (at
    // 100 TB a bucketed index table maintained across ingests — the
    // groupBy here stands in for reading it), the membership probe is a
    // left join on an 8-byte xxhash64 (AQE-skew-splittable; a hot
    // boilerplate text in the increment cannot funnel), and the
    // within-batch winner is a partial-combine min aggregate (the d14
    // shape), never a window on the hash. The oracle keys on md5(text)
    // independently, so verdicts agree modulo a 2⁻⁶⁴ collision, which
    // the gate would catch.
    "d19_incremental_dedup" -> { (s, dir) =>
      val cps = corpus(s, dir)
      val batch = cps.filter(col("doc_id") >= 100000)
        .withColumn("h", xxhash64(col("text")))
      val histIdx = cps.filter(col("doc_id") < 100000)
        .groupBy(xxhash64(col("text")).as("h")).agg(lit(1).as("in_hist"))
      val firsts = batch.groupBy(col("h")).agg(min(col("doc_id")).as("first_id"))
      batch
        .join(histIdx, Seq("h"), "left")
        .join(firsts, Seq("h"))
        .withColumn("status",
          when(col("in_hist") === 1, "dup_vs_history")
            .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
            .otherwise("new"))
        .select(col("doc_id"), col("status"))
    },

    // ---- incremental NEAR-dup verdict: the increment vs the pair graph ----
    // d19's fuzzy counterpart: for every increment doc, is it a
    // near-duplicate (d2 semantics, Jaccard ≥ 0.6) of anything already
    // ingested (`near_hist`), or of an EARLIER doc in its own batch
    // (`near_batch`, first-wins greedy so the verdict is deterministic)?
    // Consumes the STAGED d2 pair graph — no new pair stage, the
    // d15/d18 composition contract (lock-asserted). In production the
    // graph is maintained incrementally (the persistent band index is
    // probed by increment bands only); the verdict layer here is
    // identical either way: increment ids sort after all history ids,
    // so every partner of an increment doc sits on the doc_b side of
    // the (doc_a < doc_b) graph, and one aggregate over the filtered
    // graph + one left join against the increment produces the flags.
    "d20_incremental_neardup" -> { (s, dir) =>
      val pairs = d2Pairs(s, dir) // the STAGED graph — shared with d2/d18
      val batchIds = corpus(s, dir).filter(col("doc_id") >= 100000)
        .select(col("doc_id"))
      val flags = pairs.filter(col("doc_b") >= 100000)
        .groupBy(col("doc_b").as("doc_id"))
        .agg(max(when(col("doc_a") < 100000, 1).otherwise(0)).as("nh"),
          max(when(col("doc_a") >= 100000, 1).otherwise(0)).as("nb"))
      batchIds.join(flags, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nh"), lit(0)).as("near_hist"),
          coalesce(col("nb"), lit(0)).as("near_batch"))
        .withColumn("keep",
          when(col("near_hist") === 0 && col("near_batch") === 0, 1).otherwise(0))
    },

    // ---- semantic dedup: keeper selection over the embedding graph ----
    // The SemDeDup pass (Abbas et al. 2023): treat cosine-near-duplicate
    // embeddings as redundant and keep ONE representative per connected
    // group. Composes the repo's existing scale machinery — d8's
    // LSH-bucketed + exact-verified pair generation and d13's
    // contracting connected components — so the whole operator inherits
    // their no-quadratic-stage guarantees. Representative = min vec_id
    // (deterministic); vectors with no near-dup are their own keeper
    // and never enter the component iteration.
    "d15_semantic_dedup" -> { (s, dir) =>
      val pairs = d8Pairs(s, dir) // the STAGED graph — shared with d8's report

      val lab = Ops.connectedComponents(
          pairs.select(col("vec_a").as("a"), col("vec_b").as("b")))
        .select(col("vertex").as("vec_id"), col("component").as("rep"))
      val ids = t(s, dir, "embeddings").select(col("vec_id"))
      val allIds = ids.unionByName(
        ids.select((col("vec_id") + 100000).as("vec_id")))
      val singles = allIds
        .join(lab.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("vec_id").as("rep"))
      lab.unionByName(singles)
        .select(col("vec_id"), col("rep").as("cluster_rep"),
          when(col("vec_id") === col("rep"), 1).otherwise(0).as("keep"))
    },

    // ---- n-gram (word bigram) Jaccard within source buckets ----
    // Exact pairwise similarity, bucketed by `source`. Valid when cells
    // stay bounded (per-crawl-batch, per-day); for cells that grow with
    // the corpus, d2's LSH candidate generation is the unbounded-scale
    // path — this operator is the exact within-cell complement.
    "d4_ngram_jaccard" -> { (s, dir) =>
      // Count-based: explode grams, equi-join on (source, gram), count
      // shared grams per pair, derive union from broadcast cardinalities.
      // Only (id, id) int pairs ever shuffle — never the gram arrays
      // (an earlier array_intersect pair-join shape was 6× slower, all
      // serialization).
      // Gram relation: spread FIRST, build grams, MATERIALIZE before
      // the explode (optimization r15, profiled at sf0.1). Two
      // pathologies hid here: (a) with the gram projection below the
      // spreading exchange, a single-split input computed every gram
      // in ONE scan task (two concurrent 2.8 s single-task jobs were
      // the whole query's cost); (b) with the projection above the
      // exchange, the explode collapses onto it and the interpreted
      // HOF chain re-evaluates PER OUTPUT ROW — a tokens-per-doc×
      // blowup that measured the same 2.8 s spread over every core
      // (micro-probe: explode over the projected array 2.8 s, over
      // the materialized array 0.13 s warm). The staged checkpoint
      // (the d2 ex pattern: executor-local blocks, released by
      // stagedClear) both spreads the gram work and pins the arrays
      // so the explode reads them instead of re-deriving them. Same
      // rows, same counts, byte-identical output.
      val docs = Ops.staged(s, dir, "d4_grams") {
        t(s, dir, "documents")
          .repartition(spread(s), col("doc_id")) // single-file input: spread the gram work
          .withColumn("w", split(col("text"), " "))
          .withColumn("g", expr(
            """array_distinct(filter(transform(w, (x, i) ->
              |  IF(i <= size(w) - 2, concat(x, '_', element_at(w, i + 2)), NULL)),
              |  y -> y IS NOT NULL))""".stripMargin))
          .select(col("source"), col("doc_id"), col("g"))
      }
      // grams collapse to their xxhash64 up front (see d2): the window
      // pass and the self-join below shuffle an 8-byte long instead of
      // a word-bigram string; counts are identical modulo 2⁻⁶⁴
      // collisions, which the oracle gate would catch.
      val ex = docs.select(col("source"), col("doc_id"), explode(col("g")).as("gs"))
        .select(col("source"), col("doc_id"), xxhash64(col("gs")).as("gram"))
      // DF cap (see MaxGramDf): document frequency as an AGGREGATE, not
      // a window. A window partitioned by (source, gram) funnels every
      // copy of a hot gram — the stopword-pair grams the cap exists to
      // discard — through one unsplittable task's sort (the d14 skew
      // lesson). The aggregate gets map-side partial combine (a hot gram
      // collapses to one row per input partition before the shuffle),
      // the capped-gram relation carries only survivors, and the
      // flagging join back onto `ex` is AQE-skew-splittable. The join
      // leaves the relation hash-partitioned on exactly the self-join
      // key, same as the window did. Cardinalities count the retained
      // grams only, so both sides of the Jaccard test use the same
      // capped gram universe.
      val capped = ex.groupBy(col("source"), col("gram"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= MaxGramDf)
        .select(col("source"), col("gram"))
      // kept feeds three consumers (cards + both self-join sides), but
      // NO materialization: the shuffle feeding the cap aggregate is a
      // ReusedExchange for the join probes, so the explode runs once
      // anyway — a localCheckpoint here measured SLOWER (4.9 vs 4.1 s
      // warm at sf0.1, block-write cost with no recompute saved)
      val kept = ex.join(capped, Seq("source", "gram"))
      val cards = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      val inter = kept.as("a").join(kept.as("b"),
          col("a.source") === col("b.source") && col("a.gram") === col("b.gram") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter_cnt"))
      // cards scales with the corpus — no broadcast hint (see d2)
      inter
        .join(cards.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("c", "ca"), "doc_a")
        .join(cards.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("c", "cb"), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
          (col("ca") + col("cb") - col("inter_cnt")).as("union_cnt"))
        .filter(col("inter_cnt") * 25 >= col("union_cnt") * 2) // J >= 0.08
    },

    // ---- brute-force cosine top-k (the ANN correctness baseline) ----
    // Pipeline: d5TopKPlan; the query serves the STAGED ranked list
    // (consumed again by the d21 quality report).
    "d5_ann_bruteforce" -> { (s, dir) => d5TopK(s, dir) },

    // ---- LSH-bucketed ANN (the scale path) ----
    // Pipeline: d6TopKPlan; staged (see d5), knob-keyed on the bit
    // width. The candidate RECALL is approximate (AnnRecallSpec
    // anchors it), but the computation is bit-reproducible
    // cross-engine — so it IS hash-gated against an exact DuckDB
    // oracle; d5 is its exact-search baseline.
    "d6_ann_lsh" -> { (s, dir) => d6TopK(s, dir) },

    // ---- IVF ANN: trained coarse quantizer + probed cells ----
    // Pipeline: d11TopKPlan; staged (see d5), knob-keyed on kCells.
    "d11_ann_ivf" -> { (s, dir) => d11TopK(s, dir) },

    // ---- ANN index-quality report (the d18 pattern applied to ANN) ----
    // Recall is usually a spec-only number (AnnRecallSpec); this makes
    // index quality AUDITABLE IN-PIPELINE at any scale: for each query,
    // how many of the EXACT top-k (d5) does each approximate index (d6
    // LSH, d11 IVF) recover? Consumes the three STAGED ranked lists —
    // adds no candidate generation of its own (lock-asserted), and the
    // join/aggregate runs over ≤ |queries|×k rows regardless of corpus
    // size. All three inputs are oracle-exact, so the report is too.
    "d21_ann_quality" -> { (s, dir) =>
      val ex = d5TopK(s, dir).select(col("query_id"), col("vec_id"))
      val l = d6TopK(s, dir)
        .select(col("query_id"), col("vec_id"), lit(1).as("in_lsh"))
      val iv = d11TopK(s, dir)
        .select(col("query_id"), col("vec_id"), lit(1).as("in_ivf"))
      ex.join(l, Seq("query_id", "vec_id"), "left")
        .join(iv, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("in_lsh"), lit(0))).as("lsh_hits"),
          sum(coalesce(col("in_ivf"), lit(0))).as("ivf_hits"))
    },

    // ---- per-label embedding centroids (vector aggregation) ----
    "d7_embed_centroid" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(dmean(col("x").cast("double"), 8).as("mean_val"))
    },

    // ---- L2 normalization (the vector 'resize' of the pipeline) ----
    // Norms accumulate as decimals (squares of unit-scale floats at
    // scale 12: exact, order-independent) so both engines compute the
    // same sqrt input and the same normalized components bit-for-bit.
    "d9_embed_normalize" -> { (s, dir) =>
      val parts = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("xd", col("x").cast("double"))
      val norms = parts.groupBy(col("vec_id"))
        .agg(sqrt(sum((col("xd") * col("xd")).cast(DecimalType(28, 12))).cast("double")).as("norm"))
      parts.join(norms, "vec_id")
        .filter(col("pos") < 4) // first 4 components keep output compact
        .select(col("vec_id"), col("pos"), (col("xd") / col("norm")).as("nval"))
    },

    // ---- embedding-cosine near-dup dedup (LSH-bucketed, exact-verified) ----
    // Pipeline: d8PairsPlan; the query serves the STAGED pair graph.
    "d8_embed_neardup" -> { (s, dir) => d8Pairs(s, dir) },

    // ---- int8 scalar quantization (embedding storage compression) ----
    // Per-vector min/max scalar quantization — the 4×/8× storage cut a
    // 100 TB embedding store takes before anything else. Pure per-row
    // codegen'd higher-order functions: no shuffle at all, so it scales
    // as a map-only stage. Both engines run the identical double
    // expression tree ((x-mn)*255/(mx-mn), then floor), so the integer
    // codes and their checksums hash-match exactly.
    "d12_embed_quantize" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("mn", array_min(col("e")))
        .withColumn("mx", array_max(col("e")))
        .withColumn("q", expr(
          """transform(e, x -> CAST(floor(
            |  IF(mx = mn, 0.0D, ((x - mn) * 255.0D) / (mx - mn))) AS INT))""".stripMargin))
        .select(col("vec_id"), col("mn"), col("mx"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
          expr("size(filter(q, x -> x >= 255))").as("q_hi_cnt"))
    }
  )

  /** d11's oracle: Lloyd's unrolled as CTE chains. Every step mirrors
   * annIvfTopK exactly — md5-hash seed order, first-wins argmax
   * (ORDER BY sim DESC, cell ASC), decimal-exact DECIMAL(18,12) means
   * (Ops.dmean's twin), empty cells inheriting the previous centroid —
   * and the cosine itself is the d5-proven list_cosine_similarity
   * bit-parity. iters/kCells/nprobe/k match the query's defaults. */
  private def ivfOracleSql(kCells: Int = 16, nprobe: Int = 4, k: Int = 3,
      iters: Int = 2): String = {
    def assign(name: String, cents: String): String =
      s"""${name}_r AS (
         |  SELECT b.vec_id, b.e, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
         |      ORDER BY list_cosine_similarity(b.e, c.e) DESC, c.cell ASC) rn
         |  FROM base b CROSS JOIN $cents c),
         |$name AS (SELECT vec_id, e, cell FROM ${name}_r WHERE rn = 1)""".stripMargin
    def newCents(name: String, fromAssign: String, prevCents: String): String =
      s"""${name}_m AS (
         |  SELECT cell, i - 1 AS pos,
         |    CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS m
         |  FROM (SELECT cell, unnest(e) x,
         |          unnest(generate_series(1, len(e))) i FROM $fromAssign)
         |  GROUP BY 1, 2),
         |$name AS (
         |  SELECT cell, list(m ORDER BY pos) e FROM ${name}_m GROUP BY cell
         |  UNION ALL
         |  SELECT p.cell, p.e FROM $prevCents p
         |  WHERE p.cell NOT IN (SELECT cell FROM ${name}_m))""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""${assign(s"a$i", s"c${i - 1}")},
         |${newCents(s"c$i", s"a$i", s"c${i - 1}")}""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
       |c0 AS (
       |  SELECT cell, e FROM (
       |    SELECT e, ROW_NUMBER() OVER (ORDER BY
       |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
       |      vec_id) - 1 AS cell
       |    FROM base) WHERE cell < $kCells),
       |$iterCtes,
       |${assign("fin", s"c$iters")},
       |pr AS (
       |  SELECT b.vec_id AS query_id, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY list_cosine_similarity(b.e, c.e) DESC, c.cell ASC) rn
       |  FROM base b CROSS JOIN c$iters c WHERE b.vec_id < 5),
       |probes AS (SELECT query_id, cell FROM pr WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN fin a ON a.cell = p.cell AND a.vec_id <> p.query_id)
       |SELECT query_id, rank, vec_id FROM (
       |  SELECT c.query_id,
       |    ROW_NUMBER() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(qe.e, ce.e) DESC,
       |               c.vec_id ASC) AS rank,
       |    c.vec_id
       |  FROM cand c
       |  JOIN base qe ON qe.vec_id = c.query_id
       |  JOIN base ce ON ce.vec_id = c.vec_id)
       |WHERE rank <= $k""".stripMargin
  }

  /** The complete d2 all-pairs oracle — factored so the d18 agreement
   * oracle can nest it verbatim as a CTE (single-source with the d2
   * gate, the D8PairsSql pattern). */
  private lazy val D2PairsOracle: String =
    s"""WITH $ShinglesSql,
       |cards AS (SELECT doc_id, len(s) c FROM sh WHERE len(s) > 0),
       |ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
       |inter AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) i
       |          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b, i AS inter_cnt,
       |       ca.c + cb.c - i AS union_cnt
       |FROM inter
       |JOIN cards ca ON ca.doc_id = da
       |JOIN cards cb ON cb.doc_id = db
       |WHERE i * 10 >= (ca.c + cb.c - i) * 6""".stripMargin

  /** The complete d10 all-pairs oracle — factored for d18 (see
   * [[D2PairsOracle]]). */
  private lazy val D10PairsOracle: String =
    s"""WITH $SimhashSigsSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  /** A def, not a val: the knob-bearing oracles (d6/d8/d15/d11) must
   * re-resolve GraftConf system properties at generation time so a
   * non-default run regenerates matching SQL. */
  def oracles: Map[String, String] = Map(

    "d11_ann_ivf" -> ivfOracleSql(kCells = GraftConf.int(GraftConf.AnnKCells, 16)),
    "d1_dedup_exact" ->
      s"""WITH $CorpusSql
         |SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS dup_cnt
         |FROM corpus GROUP BY md5(text)""".stripMargin,

    "d2_minhash_lsh" -> D2PairsOracle,

    "d3_simhash" ->
      s"""WITH $SimhashSigsSql
         |SELECT doc_id, simhash FROM sigs""".stripMargin,

    "d10_simhash_neardup" -> D10PairsOracle,

    // cross-method precision report: the same full-outer join the
    // engine runs, over the two factored all-pairs oracles (each a
    // complete SELECT, nested as a CTE — their internal CTE names
    // collide, so they can't share one WITH list)
    "d18_pair_agreement" ->
      s"""WITH mh AS ($D2PairsOracle),
         |sh AS ($D10PairsOracle)
         |SELECT COALESCE((mh.inter_cnt * 10) // mh.union_cnt, -1) AS jband,
         |       COALESCE(CAST(sh.hamming AS BIGINT), -1) AS hamming,
         |       COUNT(*) AS n_pairs
         |FROM mh FULL OUTER JOIN sh USING (doc_a, doc_b)
         |GROUP BY 1, 2""".stripMargin,

    "d19_incremental_dedup" ->
      s"""WITH $CorpusSql,
         |bh AS (SELECT doc_id, md5(text) h FROM corpus WHERE doc_id >= 100000),
         |hist AS (SELECT DISTINCT md5(text) h FROM corpus WHERE doc_id < 100000),
         |f AS (SELECT h, MIN(doc_id) first_id FROM bh GROUP BY 1)
         |SELECT bh.doc_id,
         |  CASE WHEN hist.h IS NOT NULL THEN 'dup_vs_history'
         |       WHEN bh.doc_id <> f.first_id THEN 'dup_in_batch'
         |       ELSE 'new' END AS status
         |FROM bh LEFT JOIN hist ON bh.h = hist.h
         |JOIN f ON bh.h = f.h""".stripMargin,

    // the d2 all-pairs oracle nested as a CTE (the d18 pattern), then
    // the same flags-per-increment-doc aggregation the engine runs
    "d20_incremental_neardup" ->
      s"""WITH b AS (SELECT doc_id + 100000 AS doc_id FROM documents),
         |p AS ($D2PairsOracle),
         |f AS (SELECT b.doc_id,
         |    CAST(COALESCE(MAX(CASE WHEN p.doc_a < 100000 THEN 1 ELSE 0 END), 0) AS INT) AS near_hist,
         |    CAST(COALESCE(MAX(CASE WHEN p.doc_a >= 100000 THEN 1 ELSE 0 END), 0) AS INT) AS near_batch
         |  FROM b LEFT JOIN p ON p.doc_b = b.doc_id
         |  GROUP BY b.doc_id)
         |SELECT doc_id, near_hist, near_batch,
         |  CAST(CASE WHEN near_hist = 0 AND near_batch = 0 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM f""".stripMargin,

    // transitive closure (UNION dedups, so cycles terminate) + min id
    // per component — the all-pairs spelling of d13's propagation
    "d13_dedup_clusters" ->
      s"""WITH RECURSIVE $SimhashSigsSql,
         |pairs AS (SELECT a.doc_id da, b.doc_id db
         |          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |edges AS (SELECT da s, db d FROM pairs
         |          UNION ALL SELECT db, da FROM pairs),
         |reach(v, l) AS (
         |  SELECT doc_id, doc_id FROM sigs
         |  UNION
         |  SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v),
         |lab AS (SELECT v AS doc_id, MIN(l) AS label FROM reach GROUP BY v),
         |sizes AS (SELECT label, COUNT(*) AS cluster_size FROM lab GROUP BY label)
         |SELECT lab.doc_id, lab.label AS cluster_rep, sizes.cluster_size
         |FROM lab JOIN sizes ON lab.label = sizes.label""".stripMargin,

    "d14_paragraph_dedup" ->
      s"""WITH $CorpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
         |ch0 AS (SELECT doc_id, list_transform(
         |          generate_series(0, CAST(ceil(len(w) / $ParagraphTokens.0) AS INT) - 1),
         |          i -> {'idx': i, 'chunk': array_to_string(
         |                 list_slice(w, i * $ParagraphTokens + 1,
         |                            i * $ParagraphTokens + $ParagraphTokens), ' ')}) cs
         |        FROM tok),
         |ch AS (SELECT doc_id, unnest(cs, recursive := true) FROM ch0),
         |rn AS (SELECT doc_id, idx, chunk,
         |         ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) rn
         |       FROM ch)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx), '')
         |         AS dedup_text
         |FROM rn GROUP BY doc_id""".stripMargin,

    "d16_dup_spans" ->
      s"""WITH $CorpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
         |wins0 AS (SELECT doc_id, list_transform(
         |            generate_series(0, len(w) - $DupSpanTokens),
         |            i -> {'idx': i, 'h': md5(array_to_string(
         |                   list_slice(w, i + 1, i + $DupSpanTokens), ' '))}) cs
         |          FROM tok WHERE len(w) >= $DupSpanTokens),
         |wins AS (SELECT doc_id, unnest(cs, recursive := true) FROM wins0),
         |dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
         |dw AS (SELECT doc_id, idx FROM wins JOIN dup USING (h)),
         |isl AS (SELECT doc_id, idx,
         |          idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
         |        FROM dw)
         |SELECT doc_id, MIN(idx) AS span_start,
         |       MAX(idx) + $DupSpanTokens - 1 AS span_end,
         |       CAST(MAX(idx) - MIN(idx) + $DupSpanTokens AS BIGINT) AS span_tokens
         |FROM isl GROUP BY doc_id, grp""".stripMargin,

    // first-wins via ROW_NUMBER over the total order (doc_id, idx) ≡
    // the engine's min(struct) winner (the d14 oracle equivalence)
    "d17_span_dedup" ->
      s"""WITH $CorpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
         |wins0 AS (SELECT doc_id, list_transform(
         |            generate_series(0, len(w) - $DupSpanTokens),
         |            i -> {'idx': i, 'h': md5(array_to_string(
         |                   list_slice(w, i + 1, i + $DupSpanTokens), ' '))}) cs
         |          FROM tok WHERE len(w) >= $DupSpanTokens),
         |wins AS (SELECT doc_id, unnest(cs, recursive := true) FROM wins0),
         |wn AS (SELECT doc_id, idx,
         |         COUNT(*) OVER (PARTITION BY h) c,
         |         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) rn
         |       FROM wins),
         |nonfirst AS (SELECT doc_id, idx FROM wn WHERE c >= 2 AND rn > 1),
         |dropped AS (SELECT DISTINCT doc_id, idx + j AS pos
         |            FROM nonfirst CROSS JOIN generate_series(0, ${DupSpanTokens - 1}) g(j)),
         |toks AS (SELECT doc_id, i - 1 AS pos, tokn FROM (
         |           SELECT doc_id, unnest(w) tokn,
         |                  unnest(generate_series(1, len(w))) i FROM tok)),
         |flag AS (SELECT t.doc_id, t.pos, t.tokn, d.doc_id IS NOT NULL AS dropped
         |         FROM toks t LEFT JOIN dropped d
         |           ON d.doc_id = t.doc_id AND d.pos = t.pos)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       COALESCE(string_agg(CASE WHEN NOT dropped THEN tokn END, ' ' ORDER BY pos), '')
         |         AS dedup_text
         |FROM flag GROUP BY doc_id""".stripMargin,

    // winnowing selection replicated bit-for-bit: md5-derived window
    // hashes (the cross-engine value convention), leftmost-min
    // selection per winnow window, gap-W island grouping
    "d22_winnowed_spans" ->
      s"""WITH $CorpusSql,
         |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
         |th0 AS (SELECT doc_id, list_transform(
         |          generate_series(0, len(w) - $DupSpanTokens),
         |          i -> ('0x' || substr(md5(array_to_string(
         |                 list_slice(w, i + 1, i + $DupSpanTokens), ' ')), 1, 15))::BIGINT) th
         |        FROM tok WHERE len(w) >= $DupSpanTokens),
         |sel0 AS (SELECT doc_id, th, list_distinct(list_transform(
         |           generate_series(0, greatest(len(th) - $winnowW, 0)),
         |           j -> j + list_position(list_slice(th, j + 1, j + $winnowW),
         |                  list_min(list_slice(th, j + 1, j + $winnowW))) - 1)) sels
         |         FROM th0),
         |sel AS (SELECT doc_id, unnest(list_transform(sels,
         |          p -> {'idx': p, 'h': th[CAST(p + 1 AS INT)]}), recursive := true)
         |        FROM sel0),
         |dup AS (SELECT h FROM sel GROUP BY h HAVING COUNT(*) >= 2),
         |dsel AS (SELECT doc_id, idx FROM sel JOIN dup USING (h)),
         |g AS (SELECT doc_id, idx, CASE WHEN idx - LAG(idx, 1, ${-(winnowW + 1)})
         |        OVER (PARTITION BY doc_id ORDER BY idx) > $winnowW
         |        THEN 1 ELSE 0 END f
         |      FROM dsel),
         |g2 AS (SELECT doc_id, idx,
         |         SUM(f) OVER (PARTITION BY doc_id ORDER BY idx) grp FROM g)
         |SELECT doc_id, CAST(MIN(idx) AS BIGINT) AS span_start,
         |       CAST(MAX(idx) + ${DupSpanTokens - 1} AS BIGINT) AS span_end,
         |       COUNT(*) AS n_fingerprints
         |FROM g2 GROUP BY doc_id, grp""".stripMargin,

    "d4_ngram_jaccard" ->
      s"""WITH tok AS (SELECT source, doc_id, string_split(text, ' ') w FROM documents),
        |g AS (SELECT source, doc_id, list_distinct(list_transform(
        |        generate_series(1, greatest(len(w) - 1, 0)),
        |        i -> w[i] || '_' || w[i+1])) g FROM tok),
        |ex AS (SELECT source, doc_id, unnest(g) gram FROM g),
        |kept AS (SELECT source, doc_id, gram FROM (
        |           SELECT source, doc_id, gram,
        |                  COUNT(*) OVER (PARTITION BY source, gram) df FROM ex)
        |         WHERE df <= $MaxGramDf),
        |cards AS (SELECT doc_id, COUNT(*) c FROM kept GROUP BY doc_id),
        |inter AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) i
        |          FROM kept a JOIN kept b ON a.gram = b.gram AND a.source = b.source
        |            AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b, i AS inter_cnt,
        |       ca.c + cb.c - i AS union_cnt
        |FROM inter
        |JOIN cards ca ON ca.doc_id = da
        |JOIN cards cb ON cb.doc_id = db
        |WHERE i * 25 >= (ca.c + cb.c - i) * 2""".stripMargin,

    "d5_ann_bruteforce" -> D5OracleSql,

    // recall made auditable: per query, the exact top-k left-joined
    // against each approximate index's list — the three factored full
    // oracles nested as CTEs (the d18 pattern)
    "d21_ann_quality" ->
      s"""WITH ex AS ($D5OracleSql),
         |l AS (${d6OracleSql(GraftConf.int(GraftConf.LshBits, 10))}),
         |iv AS (${ivfOracleSql(kCells = GraftConf.int(GraftConf.AnnKCells, 16))})
         |SELECT ex.query_id, COUNT(*) AS k,
         |  CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_hits,
         |  CAST(SUM(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivf_hits
         |FROM ex
         |LEFT JOIN l ON l.query_id = ex.query_id AND l.vec_id = ex.vec_id
         |LEFT JOIN iv ON iv.query_id = ex.query_id AND iv.vec_id = ex.vec_id
         |GROUP BY ex.query_id""".stripMargin,

    "d9_embed_normalize" ->
      """WITH parts AS (
        |  SELECT vec_id, i - 1 AS pos, x::DOUBLE AS xd
        |  FROM (SELECT vec_id, unnest(embedding) x,
        |          unnest(generate_series(1, len(embedding))) i
        |        FROM embeddings)),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(SUM(CAST(xd * xd AS DECIMAL(28,12))) AS DOUBLE)) AS norm
        |  FROM parts GROUP BY vec_id)
        |SELECT p.vec_id, p.pos, p.xd / n.norm AS nval
        |FROM parts p JOIN norms n ON p.vec_id = n.vec_id
        |WHERE p.pos < 4""".stripMargin,

    "d8_embed_neardup" ->
      s"""WITH ${d8PairsSql(GraftConf.int(GraftConf.LshD8Bits, 12))}
         |SELECT va AS vec_a, vb AS vec_b FROM vpairs""".stripMargin,

    // keeper selection = transitive closure over the d8 pair graph
    // (the all-pairs spelling of d15's contracting components), min id
    // per component as the representative
    "d15_semantic_dedup" ->
      s"""WITH RECURSIVE ${d8PairsSql(GraftConf.int(GraftConf.LshD8Bits, 12))},
         |edges AS (SELECT va s, vb d FROM vpairs
         |          UNION ALL SELECT vb, va FROM vpairs),
         |reach(v, l) AS (
         |  SELECT vec_id, vec_id FROM vcorpus
         |  UNION
         |  SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v),
         |lab AS (SELECT v AS vec_id, MIN(l) AS cluster_rep FROM reach GROUP BY v)
         |SELECT vec_id, cluster_rep,
         |       CASE WHEN vec_id = cluster_rep THEN 1 ELSE 0 END AS keep
         |FROM lab""".stripMargin,

    "d7_embed_centroid" ->
      """SELECT label, i - 1 AS pos,
        |  CAST(SUM(CAST(x::DOUBLE AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS mean_val
        |FROM (SELECT label, unnest(embedding) x,
        |        unnest(generate_series(1, len(embedding))) i
        |      FROM embeddings)
        |GROUP BY 1, 2""".stripMargin,

    "d12_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |m AS (SELECT vec_id, e, list_min(e) mn, list_max(e) mx FROM e),
        |q AS (SELECT vec_id, mn, mx,
        |    list_transform(e, x -> CAST(floor(
        |      CASE WHEN mx = mn THEN 0.0
        |           ELSE ((x - mn) * 255.0) / (mx - mn) END) AS INT)) q
        |  FROM m)
        |SELECT vec_id, mn, mx,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(q, x -> x >= 255)) AS INT) AS q_hi_cnt
        |FROM q""".stripMargin,
    "d6_ann_lsh" -> d6OracleSql(GraftConf.int(GraftConf.LshBits, 10))
    // every DedupQueries entry is oracle-gated (d11's oracle is the
    // ivfOracleSql entry at the TOP of this map); since round 7 EVERY
    // query repo-wide is oracle-gated, pinned by QueriesSmokeSpec
  )

  /** The complete d5 all-pairs exact top-k oracle — factored so d21
   * can nest it as a CTE (the d18 pattern). */
  private lazy val D5OracleSql: String =
    """SELECT q.vec_id AS query_id,
      |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
      |             e.vec_id ASC) AS rank,
      |  e.vec_id
      |FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |WHERE q.vec_id < 5
      |QUALIFY rank <= 3""".stripMargin

  /** The complete d6 oracle, factored for d21. d6's candidate
   * generation is reproducible bit-for-bit in SQL (integer-plane
   * buckets, see lshPlanes), and its scoring/ranking is d5's — which
   * already hash-matches — so the whole approximate operator gets an
   * exact oracle twin. The embeddings table is dim-64 at every SF
   * (the planes here are lshPlanes(64)). */
  private def d6OracleSql(bits: Int): String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
       |qz AS (SELECT vec_id, list_transform(e, x -> floor(x * 1000.0)) q
       |       FROM base),
       |bk AS (SELECT vec_id,
       |         unnest([${bucketExprsSql(lshPlanes(64, bits)).mkString(",\n           ")}]) bucket
       |       FROM qz),
       |qb AS (SELECT vec_id AS query_id, bucket FROM bk WHERE vec_id < 5),
       |cand AS (SELECT DISTINCT qb.query_id, bk.vec_id
       |         FROM bk JOIN qb ON bk.bucket = qb.bucket
       |           AND bk.vec_id <> qb.query_id)
       |SELECT query_id, rank, vec_id FROM (
       |  SELECT c.query_id,
       |    ROW_NUMBER() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(qe.e, ce.e) DESC,
       |               c.vec_id ASC) AS rank,
       |    c.vec_id
       |  FROM cand c
       |  JOIN base qe ON qe.vec_id = c.query_id
       |  JOIN base ce ON ce.vec_id = c.vec_id)
       |WHERE rank <= 3""".stripMargin
}
