package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftConf

/**
 * Text-analysis, multimodal-column, and event-sessionization operators
 * for training-data pipelines, over `documents` and `events`.
 *
 * All scalar work stays in Spark SQL built-in/higher-order functions
 * (whole-stage-codegen'd); the one mapPartitions (m1) exists to exercise
 * the typed binary-column pipeline shape where a real decoder would sit.
 */
object TextQueries {

  import Ops.{t, events, spread}

  /** The stored-binary-column stage shared by the multimodal queries:
   * doc ids → synthesized opaque payloads, spread over partitions before
   * the CPU-heavy synth/decode work (single-file input starts at 1-2
   * partitions). One definition so a change to the payload shape cannot
   * drift between m1/m2/m3. */
  private def storedPayloads(s: SparkSession, dir: String,
      synth: Long => Array[Byte]): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val sq = s
    import sq.implicits._
    t(s, dir, "documents")
      .repartition(spread(s), col("doc_id"))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synth(id))))
      .toDF("doc_id", "payload") // the opaque binary column a reader sees
      .as[(Long, Array[Byte])]
  }

  private[graft] val Stopwords = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "du"),
    "zh" -> Seq("的", "是", "了"))
  private[graft] val LangOrder = Seq("en", "de", "es", "fr", "zh")

  // PII regexes shared by t9 (scan/redact) and t13 (curation gate) —
  // the Java/RE2 common subset, so both engines match identical spans
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** t9's deterministic PII plants (the synthetic corpus has none), by
   * doc_id residue — one definition shared by t9 and t13 so the
   * planted instances cannot drift between the scan and the gate. */
  private def withPiiPlants(df: DataFrame): DataFrame =
    df.withColumn("txt", concat(col("text"),
      when(col("doc_id") % 7 === 0, concat(lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, concat(lit(" from 192.168."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") % 100).cast("string"), lit(" logged"))).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(" call 555-123-4567 soon"))
        .otherwise(lit(""))))

  /** SQL twin of [[withPiiPlants]] (`text` → `txt`). */
  private val PiiPlantsSql =
    """text ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |         THEN ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100) || ' logged'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 0
      |         THEN ' call 555-123-4567 soon' ELSE '' END AS txt""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- language ID: stopword-hit scoring, deterministic tiebreak ----
    "t1_lang_id" -> { (s, dir) =>
      val withScores = LangOrder.foldLeft(
        t(s, dir, "documents").withColumn("w", split(col("text"), " "))) { (df, lang) =>
        val lits = Stopwords(lang).map(x => s"'$x'").mkString(", ")
        df.withColumn(s"s_$lang", expr(s"size(filter(w, x -> x IN ($lits)))"))
      }
      val mx = greatest(LangOrder.map(l => col(s"s_$l")): _*)
      val pred = LangOrder.foldLeft(when(mx === 0, "und")) { (acc, lang) =>
        acc.when(col(s"s_$lang") === mx, lang)
      }
      withScores.select(col("doc_id"), col("lang").as("labeled_lang"),
        pred.as("pred_lang"))
    },

    // ---- quality scoring: length/diversity/stopword signals ----
    "t2_quality" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .withColumn("n_chars", length(col("text")))
        .withColumn("tok_cnt", size(col("w")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("w"))).cast("double") / col("tok_cnt"))
        .withColumn("stop_ratio",
          expr("size(filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is')))")
            .cast("double") / col("tok_cnt"))
        .withColumn("quality",
          lit(0.5) * col("distinct_ratio") +
            lit(0.3) * (least(col("tok_cnt"), lit(100)).cast("double") / 100.0) +
            lit(0.2) * (lit(1.0) - col("stop_ratio")))
        .select("doc_id", "n_chars", "tok_cnt", "distinct_ratio", "stop_ratio", "quality")
    },

    // ---- token counting: whitespace + BPE-ish regex segmentation ----
    "t3_token_count" -> { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"))
    },

    // ---- document fingerprinting: normalized-set md5 + rolling hash ----
    "t4_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .withColumn("nt", expr(
          "filter(split(lower(regexp_replace(text, '[^a-z0-9 ]', ' ')), ' '), x -> x != '')"))
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(col("nt"))), " ")).as("fingerprint"),
          // codegen RollingHash expression — bit-identical to the
          // interpreted aggregate/transform HOF chain it replaces
          graft.functions.GraftFunctions.rollingHash(col("w")).as("rolling_hash"))
    },

    // ---- dataset identity: content-addressable per-source digest ----
    // Data versioning for reproducible training runs: a digest of each
    // source's full content that is independent of row order, file
    // layout, and partitioning — re-run after any rewrite (OPTIMIZE,
    // zorder, delete+re-add of identical rows) and the digest is
    // unchanged iff the DATA is unchanged; any dropped/mutated row
    // flips it. Mechanics: md5 per row over a canonical field
    // rendering (both engines produce identical hex), 60 bits parsed
    // to a long, folded with the order-independent XOR aggregate plus
    // count/min/max anchors. Scale shape: pure map-side hash off the
    // scan + a partial-aggregated groupBy on the handful of sources —
    // the cheapest possible 100 TB pass, no shuffle of row data.
    "t17_dataset_fingerprint" -> { (s, dir) =>
      rowDigest(t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_digest"),
          min(col("h")).as("min_h"),
          max(col("h")).as("max_h"))
    },

    // ---- event sessionization: 30-min-gap sessions per user ----
    "t5_sessionize" -> { (s, dir) =>
      val gapNs = 1800L * 1000 * 1000 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1).otherwise(0))
        .withColumn("sess", sum(col("new_sess")).over(w))
      flagged.groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("ev")).as("max_sess_events"),
          sum(col("ev")).as("total_events"))
    },

    // ---- vocabulary extraction: top terms per language ----
    // The corpus-statistics op of a training pipeline (tokenizer vocab,
    // stopword discovery). Token counts partial-aggregate map-side;
    // the per-language ranking goes through the salted hierarchical
    // top-k, so no task ever sorts a language's whole vocabulary.
    "t6_top_terms" -> { (s, dir) =>
      val counts = t(s, dir, "documents")
        .repartition(spread(s), col("doc_id")) // single-file input: spread tokenization
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
      Ops.saltedTopK(counts, Seq(col("lang")),
          Seq(col("cnt").desc, col("tok").asc), col("tok"), 20, "rnk")
        .select("lang", "rnk", "tok", "cnt")
    },

    // ---- stratified sampling: deterministic per-source data mixing ----
    // The keep decision hashes the stable doc_id (md5 — identical in
    // both engines), so the sample is bit-reproducible across runs,
    // partitionings, and cluster sizes, unlike df.sample's RNG. Rates
    // derive from the source index as a stand-in for a mixing-weights
    // table. Pure filter + partial agg: no shuffle beyond the final
    // per-source count.
    "t7_stratified_sample" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("rate",
          lit(20) + (expr("CAST(substr(source, 4) AS INT)") % 8) * 10)
        .withColumn("sel", expr(
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
        .filter(col("sel") < col("rate"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept"), max(col("rate")).as("rate"))
    },

    // ---- repetition scoring: duplicate-trigram ratio per document ----
    // The Gopher/C4-style repetition signal: heavily repeated n-grams
    // mark boilerplate/spam for filtering. Trigram multiset per doc →
    // per-(doc, gram) counts (partial-aggregate map-side, grams never
    // leave their doc's shuffle key) → per-doc totals. Short docs
    // (< 3 tokens) survive via the left join back with zero counts.
    "t8_repetition" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val grams = docs
        .repartition(spread(s), col("doc_id")) // single-file input: spread tokenization
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """filter(transform(w, (x, i) ->
            |  IF(i <= size(w) - 3,
            |     concat(x, '_', element_at(w, i + 2), '_', element_at(w, i + 3)),
            |     NULL)), y -> y IS NOT NULL)""".stripMargin)).as("g"))
      val stats = grams.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("uniq"),
          max(col("c")).as("top_cnt"))
      docs.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("total"), lit(0L)).as("total"),
          coalesce(col("uniq"), lit(0L)).as("uniq"),
          coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
          when(coalesce(col("total"), lit(0L)) === 0, lit(0.0))
            .otherwise(((col("total") - col("uniq")) * lit(1.0)) / col("total"))
            .as("dup_ratio"))
    },

    // ---- sequence packing: token-budget pack assignment ----
    // The sample-packing step before training: concatenate documents
    // in a stable order and cut fixed token-budget windows; each doc
    // gets its pack id and offset from the EXCLUSIVE running token
    // count. The running count is q32's distributed prefix scan (local
    // sums per range chunk + a ≤#chunks-row boundary table), so no
    // single task ever scans the corpus — and it's pure integer
    // arithmetic, identical in both engines.
    "t11_sequence_pack" -> { (s, dir) =>
      val budget = 2048
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .repartitionByRange(spread(s), col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      // checkpoint after the window pass: pins pid↔row for both
      // consumers and materializes the local scan once (q32/q34)
      val loc = toks
        .withColumn("lsum", sum(col("n_tokens")).over(w)) // inclusive local cumsum
        .localCheckpoint()
      val wPre = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
      val prefix = loc.groupBy(col("pid")).agg(sum(col("n_tokens")).as("psum"))
        .select(col("pid"), coalesce(sum(col("psum")).over(wPre), lit(0L)).as("presum"))
      loc.join(broadcast(prefix), "pid")
        .withColumn("cb", col("presum") + col("lsum") - col("n_tokens"))
        .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          expr(s"cb div $budget").as("pack_id"),
          (col("cb") % budget).as("offset_in_pack"))
    },

    // ---- deterministic training-order shuffle ----
    // The reproducible global permutation a training pipeline applies
    // before batching: position = rank under a hash of the stable key,
    // so any run (and any engine) derives the identical order with no
    // stored permutation table. Same scalable two-pass shape as q18:
    // range-partition on the hash key, rank locally, add per-partition
    // offsets from a tiny count aggregate — no single-task global sort
    // at any corpus size.
    "t12_train_shuffle" -> { (s, dir) =>
      Ops.globalRowNumber(
          t(s, dir, "documents")
            .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k")),
          Seq(col("k").asc, col("doc_id").asc), "pos")
        .select(col("doc_id"), col("pos"))
    },

    // ---- domain-mixture sampling to a per-source token budget ----
    // The mixture-assembly step of a training run: each source (domain)
    // gets a token budget from its mixture weight, and docs fill it
    // greedily in a deterministic hash order (same keying as t12, so
    // the sample is reproducible from the data alone — no stored state).
    // Weights here are a fixed 1/2/3× ladder derived from the source
    // name; a real pipeline would read them from a mixture table — the
    // shape is identical. Scale shape: the per-source running token sum
    // is Ops.groupedPrefixSum — range-partitioned two-pass scan, so one
    // giant domain (at 100 TB a single crawl source can dominate the
    // corpus) spans tasks instead of funneling a per-source window.
    "t14_mixture_sample" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("tokens"),
          md5(col("doc_id").cast("string")).as("k"))
      Ops.groupedPrefixSum(docs, "source",
          Seq(col("k").asc, col("doc_id").asc), col("tokens"), "cum_tokens")
        .withColumn("budget",
          (lit(GraftConf.int(s, GraftConf.MixtureBudget, 400)) *
            (lit(1) + expr("CAST(substr(source, 4) AS INT)") % 3))
            .cast("long"))
        .filter(col("cum_tokens") <= col("budget"))
        .select(col("source"), col("doc_id"), col("tokens"),
          col("cum_tokens"), col("budget"))
    },

    // ---- RAG-style document chunking: fixed token windows + overlap ----
    // The retrieval-prep complement of t11's packing: t11 CONCATENATES
    // short docs up to a budget, this SPLITS each doc into fixed-size
    // overlapping token windows (64 tokens, stride 48 → 16-token
    // overlap), the unit an embedding/retrieval index actually stores.
    // Scale shape: pure map-side explode off the scan — no shuffle, no
    // window; fan-out is ~n_tokens/stride per doc (bounded, linear in
    // corpus size), and each chunk row carries only its own slice.
    // Every doc emits >= 1 chunk (split(' ') is never empty), and every
    // start strictly inside the token list emits one, so the final
    // partial window is kept — standard RAG chunker semantics.
    "t15_chunking" -> { (s, dir) =>
      val (csize, stride) = (64, 48)
      t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .withColumn("start",
          explode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)), lit(stride))))
        .select(col("doc_id"),
          (col("start") / stride).cast("int").as("chunk_id"),
          array_join(slice(col("w"), col("start") + 1, lit(csize)), " ").as("chunk_text"),
          least(size(col("w")) - col("start"), lit(csize)).as("n_tokens"))
    },

    // ---- corpus-LM statistical quality score (CCNet-style) ----
    // The statistical complement of t2's heuristics: score each doc by
    // the average Laplace-smoothed log-probability of its bigrams
    // under the corpus's own bigram LM — fluent, typical text scores
    // high; gibberish, boilerplate runs, and mixed-language fragments
    // score low. Everything is joins/aggregates over the corpus: the
    // LM "model" is the (bigram → count) relation itself, never
    // collected or broadcast as a driver-side table, so the same plan
    // trains-and-scores at 100 TB (bigram counts partial-aggregate;
    // the score join is a fact-to-fact equi-join AQE can skew-split).
    // Per-doc averages use the decimal-exact dsum discipline (ln
    // values cast to DECIMAL(28,12) before summing) so addition order
    // cannot flip the rounded result across engines.
    "t16_lm_score" -> { (s, dir) =>
      lmScore(t(s, dir, "documents").select(col("doc_id"), col("text")))
    },

    // ---- benchmark decontamination: 8-gram overlap vs an eval set ----
    // The contamination check every training pipeline runs before a
    // model sees the data: flag corpus documents sharing any word
    // 8-gram with a benchmark/eval set. The benchmark here is the
    // doc_id % 97 slice of the original documents (a stand-in for the
    // fixed eval suite); the corpus is DedupQueries.corpus (originals +
    // mutated near-dups), so hits include exact benchmark members AND
    // their mutated copies that still share long runs. Scale shape: the
    // eval set is small and fixed by definition → its distinct grams
    // broadcast; the corpus side is map-only until the tiny matched-
    // pair aggregation, so nothing quadratic and no corpus shuffle of
    // gram strings.
    "t10_decontam" -> { (s, dir) =>
      // 8-grams keyed by their 64-bit window hash, not the rebuilt
      // "t1_t2_…" string: the TokenWindowHashes codegen kernel hashes
      // each token once and folds 8 longs per gram, the distinct and
      // the bench join carry 8-byte keys instead of ~50-byte strings,
      // and the broadcast eval-set shrinks accordingly. Counts agree
      // with the string spelling modulo a 2⁻⁶⁴ collision (the d2/d16
      // key convention — the oracle joins the strings and the gate
      // would catch a disagreement).
      def grams(df: DataFrame): DataFrame = df
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(
          graft.functions.GraftFunctions.tokenWindowHashes(col("w"), 8)).as("g"))
        .distinct()
      val corp = DedupQueries.corpus(s, dir)
      val cg = grams(corp.repartition(spread(s), col("doc_id")))
      val bench = grams(t(s, dir, "documents")
          .filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text")))
        .select(col("g")).distinct()
      val matched = cg.join(broadcast(bench), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      corp.select(col("doc_id")).join(matched, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          when(coalesce(col("n_shared"), lit(0L)) > 0, 1).otherwise(0)
            .as("contaminated"))
    },

    // ---- PII scanning: regex detection + redaction accounting ----
    // The pre-training scrub op: count emails / IPv4s / phone-shaped
    // numbers per document and measure the redacted length. The
    // synthetic corpus contains no PII, so deterministic instances are
    // planted by doc_id residue (the d8 pattern) — the regexes then
    // have real positives AND real negatives to discriminate. Patterns
    // stay in the Java/RE2 common subset so both engines match the
    // same spans; all scalar work is codegen'd built-ins, map-only.
    "t9_pii_scan" -> { (s, dir) =>
      withPiiPlants(t(s, dir, "documents"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("txt"), lit(EmailRe), lit(0))).as("n_email"),
          size(regexp_extract_all(col("txt"), lit(IpRe), lit(0))).as("n_ip"),
          size(regexp_extract_all(col("txt"), lit(PhoneRe), lit(0))).as("n_phone"),
          length(regexp_replace(col("txt"),
            s"$EmailRe|$IpRe|$PhoneRe", "<PII>")).as("redacted_len"))
    },

    // ---- end-to-end corpus curation: the pipeline verdict per doc ----
    // What a training-data pipeline actually RUNS over the raw crawl:
    // one pass composing the individual signals this module already
    // ships — t1's language ID, t2's quality score, t9's PII gate
    // (plants shared via withPiiPlants, so scan and gate cannot
    // drift), d1's exact-dup first-wins — into a keep/drop verdict
    // with a deterministic first-failing-rule reason. Runs over the
    // planted CORPUS (documents + mutated copies), which actually
    // contains duplicate losers. Scale shape: every signal is map-only
    // codegen over the row's own text; the only shuffles are d1's
    // hash-groupBy (partial-combined) and the keeper equi-join on the
    // 16-byte text hash — a hot duplicate text meets a ONE-ROW keeper
    // marker, linear. Rule order (dup → lang → quality → pii) is the
    // cheap-signal-first order a real pipeline uses.
    "t13_curation" -> { (s, dir) =>
      val cps = DedupQueries.corpus(s, dir)
      val scored = LangOrder.foldLeft(
        cps.withColumn("w", split(col("text"), " "))) { (df, lang) =>
        val lits = Stopwords(lang).map(x => s"'$x'").mkString(", ")
        df.withColumn(s"s_$lang", expr(s"size(filter(w, x -> x IN ($lits)))"))
      }
      val mx = greatest(LangOrder.map(l => col(s"s_$l")): _*)
      val pred = LangOrder.foldLeft(when(mx === 0, "und")) { (acc, lang) =>
        acc.when(col(s"s_$lang") === mx, lang)
      }
      val feat = withPiiPlants(scored)
        .withColumn("pred_lang", pred)
        .withColumn("tok_cnt", size(col("w")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("w"))).cast("double") / col("tok_cnt"))
        .withColumn("stop_ratio",
          expr("size(filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is')))")
            .cast("double") / col("tok_cnt"))
        .withColumn("quality",
          lit(0.5) * col("distinct_ratio") +
            lit(0.3) * (least(col("tok_cnt"), lit(100)).cast("double") / 100.0) +
            lit(0.2) * (lit(1.0) - col("stop_ratio")))
        .withColumn("n_pii",
          size(regexp_extract_all(col("txt"), lit(EmailRe), lit(0))) +
            size(regexp_extract_all(col("txt"), lit(IpRe), lit(0))) +
            size(regexp_extract_all(col("txt"), lit(PhoneRe), lit(0))))
        // internal-only join key: 8-byte xxhash64 (the d14/d16 key
        // convention), never md5 hex — the oracle keys on md5(text)
        // independently, so verdicts agree modulo a 2⁻⁶⁴ collision,
        // which the gate would catch
        .withColumn("h", xxhash64(col("text")))
      val keepers = cps.groupBy(xxhash64(col("text")).as("h"))
        .agg(min(col("doc_id")).as("kid"))
      feat.join(keepers, "h")
        .withColumn("keeper", when(col("doc_id") === col("kid"), 1).otherwise(0))
        .withColumn("reason", when(col("keeper") === 0, "dup")
          .when(col("pred_lang") === "und", "lang")
          .when(col("quality") < 0.6, "quality")
          .when(col("n_pii") > 0, "pii")
          .otherwise("keep"))
        .withColumn("keep", when(col("reason") === "keep", 1).otherwise(0))
        .select("doc_id", "pred_lang", "quality", "n_pii", "keeper", "keep", "reason")
    },

    // ---- multimodal: opaque binary column + real typed decode ----
    // The binary payload is a REAL image container (binary PPM, "P6"),
    // synthesized deterministically per doc_id by PpmCodec.synthesize —
    // standing in for the upstream system that stored the bytes — and
    // then decoded by an actual grammar-correct PPM parser (comments,
    // whitespace, bounds checks) inside mapPartitions. Decoded pixel
    // stats stay in exact integer arithmetic, so the DuckDB oracle can
    // recompute them from the id-derived generator without parsing PPM.
    "m1_multimodal_meta" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      storedPayloads(s, dir, PpmCodec.synthesize)
        .mapPartitions { iter =>
          iter.map { case (id, bytes) =>
            val img = PpmCodec.decode(bytes)
            val npx = img.width * img.height * 3
            val pxSum = img.pixelSum // def rescans the raster: bind once
            (id, img.width, img.height, bytes.length, pxSum, pxSum / npx)
          }
        }
        .toDF("doc_id", "width", "height", "n_bytes", "px_sum", "mean_px")
    },

    // ---- multimodal resize: decode → 2× box downsample → stats ----
    // The "resize/frame-sample" leg of the pipeline: same synthesized
    // PPM payloads as m1, but the decoder output flows through a real
    // integer box-filter (PpmCodec.downsample2x) before aggregation.
    // The oracle recomputes the floor-averaged raster arithmetically.
    "m2_multimodal_resize" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      storedPayloads(s, dir, PpmCodec.synthesize)
        .mapPartitions { iter =>
          iter.map { case (id, bytes) =>
            val small = PpmCodec.downsample2x(PpmCodec.decode(bytes))
            (id, small.width, small.height, small.pixelSum)
          }
        }
        .toDF("doc_id", "rw", "rh", "r_px_sum")
    },

    // ---- multimodal frame-sampling over multi-frame payloads ----
    // Each doc's payload is a real multi-object container (1 + id%3 PPM
    // frames back-to-back); the decoder walks the stream frame by frame
    // and the sampler keeps every 2nd frame — the video-pipeline shape
    // where decode cost is paid only for kept frames in a real codec.
    "m3_multimodal_frames" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      storedPayloads(s, dir, PpmCodec.synthesizeFrames)
        .mapPartitions { iter =>
          iter.map { case (id, bytes) =>
            val frames = PpmCodec.decodeFrames(bytes)
            val sampled = frames.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f }
            (id, frames.length, sampled.length, sampled.map(_.pixelSum).sum)
          }
        }
        .toDF("doc_id", "n_frames", "n_sampled", "sampled_px_sum")
    },

    // ---- multimodal audio: RIFF/WAVE PCM decode → sample stats ----
    // The audio leg of the image (m1/m2) / video (m3) / audio triple:
    // same stored-binary-column shape, decoded by a real RIFF chunk
    // walker (WavCodec — unknown chunks skipped, sizes bounds-checked).
    // Stats stay in exact integer arithmetic so the oracle recomputes
    // them from the id-derived generator without parsing RIFF.
    "m4_multimodal_audio" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      storedPayloads(s, dir, WavCodec.synthesize)
        .mapPartitions { iter =>
          iter.map { case (id, bytes) =>
            val clip = WavCodec.decode(bytes)
            (id, clip.sampleRate, clip.samples.length, clip.absSum, clip.peak)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "abs_sum", "peak")
    },

    // ---- multimodal frame-level dedup: reused footage across clips ----
    // The binary-modality member of the dedup family (d1 for frames):
    // every decoded video frame is content-hashed and identical frames
    // are collapsed first-wins across the whole corpus — the
    // reused-footage / shared-intro detection a multimodal pipeline
    // runs before training. The engine does the REAL work (parse the
    // multi-frame container, hash decoded dims+raster bytes); the
    // oracle recomputes frame identity arithmetically from the
    // id-derived generator (PpmCodec.synthesizeClip: a frame IS its
    // (w, h, phase) triple, with reuse planted cross-clip at any
    // corpus size) without parsing PPM. Scale
    // shape: decode is map-side; the winner per content hash is a
    // min(struct) partial-combine aggregate joined back on the 8-byte
    // xxhash64 (the d14 shape) — a hot reused frame cannot funnel one
    // task, and only fixed-width rows ride the shuffle.
    "m5_frame_dedup" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      val frames = storedPayloads(s, dir, PpmCodec.synthesizeClip)
        .mapPartitions { iter =>
          iter.flatMap { case (id, bytes) =>
            PpmCodec.decodeFrames(bytes).zipWithIndex.map { case (img, f) =>
              // 56-bit content key (7 bytes of the shared frameDigest):
              // sign-safe in a long; a 2^-56 collision would perturb a
              // group and the oracle gate would catch it (the d2/d14
              // accepted trade-off)
              (id, f, img.width, img.height,
                java.lang.Long.parseLong(
                  PpmCodec.frameDigest(img).take(7).map("%02x".format(_)).mkString, 16))
            }
          }
        }
        .toDF("doc_id", "frame_idx", "w", "h", "k")
        // decode ONCE: the winner aggregate and the flag join both
        // consume this relation, and without a materialization each
        // consumer re-runs the container parse + raster hash over every
        // clip (AQE's broadcast choice defeats ReusedExchange here).
        // The decoded rows are fixed-width and tiny next to the
        // payloads — materializing them is the production trade.
        .localCheckpoint()
      val winners = frames.groupBy(col("k"))
        .agg(min(struct(col("doc_id"), col("frame_idx"))).as("w1"),
          count(lit(1)).as("group_size"))
      frames.join(winners, "k")
        .select(col("doc_id"), col("frame_idx"), col("w"), col("h"),
          when(col("doc_id") === col("w1.doc_id") &&
            col("frame_idx") === col("w1.frame_idx"), 1).otherwise(0).as("keeper"),
          col("group_size"))
    },

    // ---- multimodal perceptual near-dup: average-hash image dedup ----
    // The binary-modality NEAR-dup (m5 is exact frame identity; this is
    // the LAION-style pass that catches re-encoded / lightly-perturbed
    // images): decode each stored image, compute an average-hash over
    // the grayscale raster (mean-threshold bits), and collapse
    // hash-colliding images first-wins. The planted fixture
    // (PpmCodec.synthesizeNoisy) guarantees same-pattern docs are NOT
    // byte-identical — only the perceptual hash, not d1's exact md5,
    // can group them — while the noise-margin proof on the generator
    // makes the collapse bit-reproducible, so the DuckDB oracle can
    // recompute the hash arithmetically from the id-derived bit-plan
    // without parsing PPM. Scale shape: decode+hash is map-side; the
    // group winner is a partial-combine min/count aggregate joined back
    // on the fixed-width (w, h, phash) key — no window on the hot key,
    // only small rows in the shuffle.
    "m6_image_phash" -> { (s, dir) =>
      val sq = s
      import sq.implicits._
      val hashed = storedPayloads(s, dir, PpmCodec.synthesizeNoisy)
        .mapPartitions(_.map { case (id, bytes) =>
          val img = PpmCodec.decode(bytes)
          (id, img.width, img.height, PpmCodec.aHash(img))
        })
        .toDF("doc_id", "w", "h", "phash")
        // decode + hash ONCE (see m5): both consumers read the
        // materialized fixed-width rows, never the payloads twice
        .localCheckpoint()
      val winners = hashed.groupBy(col("w"), col("h"), col("phash"))
        .agg(min(col("doc_id")).as("keeper_doc"), count(lit(1)).as("group_size"))
      hashed.join(winners, Seq("w", "h", "phash"))
        .select(col("doc_id"), col("w"), col("h"), col("phash"),
          when(col("doc_id") === col("keeper_doc"), 1).otherwise(0).as("keeper"),
          col("group_size"))
    }
  )

  /** Canonical 60-bit row hash for dataset fingerprinting, appended as
   * `h` over the input's columns IN ORDER — the kernel shared by t17
   * and its streaming twin so the two digests can never drift: md5 of
   * a '|'-joined field rendering (both engines produce identical hex),
   * first 15 hex digits parsed to a long. */
  private[graft] def rowDigest(df: DataFrame): DataFrame =
    df.withColumn("h",
      conv(substring(md5(concat_ws("|",
        df.columns.map(col).toIndexedSeq: _*)), 1, 15), 16, 10).cast("long"))

  /** Word-bigram struct array over the split-words column `w` — shared
   * by t16 and its streaming twin so tokenization can never drift
   * between the two. */
  private[graft] val BigramExpr: String =
    """transform(slice(w, 1, greatest(size(w) - 1, 0)),
      |  (x, i) -> named_struct('w1', x, 'w2', element_at(w, i + 2)))""".stripMargin

  /** Corpus-LM scoring core (t16): add-one-smoothed bigram
   * log-likelihood per document, the model (unigram/bigram counts +
   * vocabulary size) built from `docs0` itself. Factored out so the
   * streaming twin's parity spec can anchor to the exact batch
   * semantics on an arbitrary document prefix. */
  private[graft] def lmScore(docs0: DataFrame): DataFrame = {
    val docs = docs0.select(col("doc_id"), split(col("text"), " ").as("w"))
    val bg = docs
      .withColumn("b", explode(expr(BigramExpr)))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = docs.select(explode(col("w")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v")) // one row: vocabulary size
    lmScoreAgainst(bg, c2, c1, vocab)
  }

  /** Score pre-computed per-doc bigrams against a given LM model (c2:
   * (w1,w2,c2), c1: (w1,c1), vocab: one-row (v)) — the piece the
   * incremental streaming twin shares: it brings its own model relations
   * (folded epoch deltas), batch t16 brings the whole-corpus ones.
   *
   * Join order (optimization r15): score the DISTINCT-bigram model
   * first (c2 ⋈ c1 ⋈ vocab — model-sized), then join the corpus-sized
   * bigram stream ONCE. The previous order (bg ⋈ c2, then ⋈ c1) put
   * the corpus-sized stream through two join keys — two full-data
   * shuffles at scale, and at bench scale Spark chose to BROADCAST the
   * joined corpus stream for the c1 join (a single-threaded ~750 ms
   * driver hash-relation build of millions of rows, profiled as t16's
   * dominant job). Inner equi-joins are associative, c2/c1 are unique
   * per key, and ll is a deterministic expression of (c2, c1, v) — so
   * per-distinct-bigram scoring is row-identical to per-occurrence,
   * and the decimal-cast sum makes addition order irrelevant. */
  private[graft] def lmScoreAgainst(bg: DataFrame, c2: DataFrame,
      c1: DataFrame, vocab: DataFrame): DataFrame =
    bg.join(
        c2.join(c1, Seq("w1"))
          .crossJoin(vocab)
          .withColumn("ll", log(
            (col("c2") + lit(1)).cast("double") / (col("c1") + col("v")).cast("double")))
          .select(col("w1"), col("w2"), col("ll")),
        Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("ll").cast(org.apache.spark.sql.types.DecimalType(28, 12))).cast("double") /
          count(lit(1)), 4).as("avg_ll"))

  // a def, not a val: the t14 oracle re-resolves the budget knob
  def oracles: Map[String, String] = Map(
    "t1_lang_id" -> {
      val scores = LangOrder.map { lang =>
        val lits = Stopwords(lang).map(x => s"'$x'").mkString(", ")
        s"len(list_filter(w, x -> x IN ($lits))) AS s_$lang"
      }.mkString(",\n  ")
      val mx = "greatest(" + LangOrder.map(l => s"s_$l").mkString(", ") + ")"
      val pred = "CASE WHEN " + mx + " = 0 THEN 'und' " +
        LangOrder.map(l => s"WHEN s_$l = $mx THEN '$l'").mkString(" ") + " END"
      s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
         |scored AS (SELECT doc_id, lang, $scores FROM tok)
         |SELECT doc_id, lang AS labeled_lang, $pred AS pred_lang FROM scored""".stripMargin
    },

    "t2_quality" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') w FROM documents),
        |base AS (SELECT doc_id, length(text) AS n_chars, len(w) AS tok_cnt,
        |  len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio,
        |  len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) * 1.0 / len(w) AS stop_ratio
        |  FROM tok)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(tok_cnt AS INT) AS tok_cnt,
        |  distinct_ratio, stop_ratio,
        |  0.5 * distinct_ratio + 0.3 * (least(tok_cnt, 100) * 1.0 / 100.0)
        |    + 0.2 * (1.0 - stop_ratio) AS quality
        |FROM base""".stripMargin,

    "t3_token_count" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS re_tokens
        |FROM documents""".stripMargin,

    "t17_dataset_fingerprint" ->
      """WITH h AS (SELECT source,
        |  ('0x' || substr(md5(concat_ws('|', doc_id, source, lang, n_chars, text)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_rows, bit_xor(h) AS xor_digest,
        |  MIN(h) AS min_h, MAX(h) AS max_h
        |FROM h GROUP BY source""".stripMargin,

    "t4_fingerprint" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') w,
        |  list_filter(string_split(lower(regexp_replace(text, '[^a-z0-9 ]', ' ', 'g')), ' '),
        |    x -> x != '') nt
        |  FROM documents)
        |SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(nt)), ' ')) AS fingerprint,
        |  list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(w, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
        |    (a, x) -> (a * 1000003 + x) % 2147483647) AS rolling_hash
        |FROM tok""".stripMargin,

    "t5_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) tsn FROM events),
        |f AS (SELECT user_id, event_id, tsn,
        |  CASE WHEN lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 1800000000000
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
        |g AS (SELECT user_id, SUM(new_sess)
        |        OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS sess
        |      FROM f),
        |per_sess AS (SELECT user_id, sess, COUNT(*) AS ev FROM g GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(ev) AS max_sess_events,
        |  CAST(SUM(ev) AS BIGINT) AS total_events
        |FROM per_sess GROUP BY user_id""".stripMargin,

    "t6_top_terms" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) tok FROM documents),
        |counts AS (SELECT lang, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
        |SELECT lang,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS INT) AS rnk,
        |  tok, CAST(cnt AS BIGINT) AS cnt
        |FROM counts
        |QUALIFY rnk <= 20""".stripMargin,

    "t7_stratified_sample" ->
      """WITH d AS (SELECT source, doc_id,
        |    20 + (CAST(substr(source, 4) AS INT) % 8) * 10 AS rate,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS sel
        |  FROM documents)
        |SELECT source, COUNT(*) AS kept, CAST(MAX(rate) AS INT) AS rate
        |FROM d WHERE sel < rate GROUP BY source""".stripMargin,

    "t8_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(
        |        generate_series(1, greatest(len(w) - 2, 0)),
        |        i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) g
        |      FROM tok),
        |pg AS (SELECT doc_id, g, COUNT(*) c FROM g GROUP BY 1, 2),
        |st AS (SELECT doc_id, SUM(c) total, COUNT(*) uniq, MAX(c) top_cnt
        |       FROM pg GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(total, 0) AS BIGINT) AS total,
        |  CAST(COALESCE(uniq, 0) AS BIGINT) AS uniq,
        |  CAST(COALESCE(top_cnt, 0) AS BIGINT) AS top_cnt,
        |  CASE WHEN COALESCE(total, 0) = 0 THEN 0.0
        |       ELSE ((total - uniq) * 1.0) / total END AS dup_ratio
        |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,

    "t11_sequence_pack" ->
      """WITH tk AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |  COALESCE(SUM(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM tk)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  CAST(cb // 2048 AS BIGINT) AS pack_id,
        |  CAST(cb % 2048 AS BIGINT) AS offset_in_pack
        |FROM c""".stripMargin,

    "t12_train_shuffle" ->
      """SELECT doc_id,
        |  ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
        |FROM documents""".stripMargin,

    "t14_mixture_sample" -> {
      val b = GraftConf.int(GraftConf.MixtureBudget, 400)
      s"""WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
        |c AS (SELECT source, doc_id, tokens,
        |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY k, doc_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM d)
        |SELECT source, doc_id, tokens, cum_tokens,
        |  CAST($b * (1 + CAST(substr(source, 4) AS INT) % 3) AS BIGINT) AS budget
        |FROM c
        |WHERE cum_tokens <= $b * (1 + CAST(substr(source, 4) AS INT) % 3)""".stripMargin
    },

    "t16_lm_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |bge AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
        |      i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS b FROM tok),
        |bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bge),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bgf GROUP BY 1, 2),
        |uni AS (SELECT unnest(w) AS w1 FROM tok),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY 1),
        |v AS (SELECT COUNT(*) AS v FROM c1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(CAST(SUM(CAST(ln((c2 + 1.0) / (c1 + v)) AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 4) AS avg_ll
        |FROM bgf JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY doc_id""".stripMargin,

    "t15_chunking" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |st AS (SELECT doc_id, w,
        |    unnest(range(0, greatest(len(w) - 1, 0) + 1, 48)) AS start FROM tok)
        |SELECT doc_id, CAST(start // 48 AS INT) AS chunk_id,
        |  array_to_string(w[start + 1 : start + 64], ' ') AS chunk_text,
        |  CAST(least(len(w) - start, 64) AS INT) AS n_tokens
        |FROM st""".stripMargin,

    "t10_decontam" -> {
      val g8 = (1 to 7).foldLeft("w[i]")((acc, j) => s"$acc || '_' || w[i+$j]")
      s"""WITH ${DedupQueries.CorpusSql},
         |tok AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
         |cg AS (SELECT DISTINCT doc_id, g FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, greatest(len(w) - 7, 0)), i -> $g8)) g
         |    FROM tok)),
         |bt AS (SELECT doc_id, string_split(text, ' ') w FROM documents
         |       WHERE doc_id % 97 = 0),
         |bench AS (SELECT DISTINCT g FROM (
         |    SELECT unnest(list_transform(
         |      generate_series(1, greatest(len(w) - 7, 0)), i -> $g8)) g
         |    FROM bt)),
         |m AS (SELECT cg.doc_id, COUNT(*) n FROM cg JOIN bench USING (g) GROUP BY 1)
         |SELECT c.doc_id, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_shared,
         |  CASE WHEN COALESCE(m.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated
         |FROM corpus c LEFT JOIN m ON c.doc_id = m.doc_id""".stripMargin
    },

    // raw interpolator: the regex '\.' must stay literal (s""" would
    // treat it as an invalid escape at class-init time)
    "t9_pii_scan" ->
      raw"""WITH w AS (SELECT doc_id, $PiiPlantsSql
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(txt, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT) AS n_ip,
        |  CAST(len(regexp_extract_all(txt, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
        |  CAST(length(regexp_replace(txt,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}|[0-9]{3}-[0-9]{3}-[0-9]{4}',
        |    '<PII>', 'g')) AS BIGINT) AS redacted_len
        |FROM w""".stripMargin,

    // composes the t1/t2/t9/d1 oracle logic over the planted corpus;
    // raw interpolator for the same '\.'-literal reason as t9
    "t13_curation" -> {
      val scores = LangOrder.map { lang =>
        val lits = Stopwords(lang).map(x => s"'$x'").mkString(", ")
        s"len(list_filter(w, x -> x IN ($lits))) AS s_$lang"
      }.mkString(",\n  ")
      val mx = "greatest(" + LangOrder.map(l => s"s_$l").mkString(", ") + ")"
      val pred = "CASE WHEN " + mx + " = 0 THEN 'und' " +
        LangOrder.map(l => s"WHEN s_$l = $mx THEN '$l'").mkString(" ") + " END"
      raw"""WITH ${DedupQueries.CorpusSql},
         |tok AS (SELECT doc_id, text, string_split(text, ' ') w FROM corpus),
         |scored AS (SELECT doc_id, text, w, $scores FROM tok),
         |feat AS (SELECT doc_id, text, $pred AS pred_lang,
         |  len(w) AS tok_cnt,
         |  len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio,
         |  len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) * 1.0 / len(w) AS stop_ratio
         |  FROM scored),
         |q AS (SELECT doc_id, text, pred_lang,
         |  0.5 * distinct_ratio + 0.3 * (least(tok_cnt, 100) * 1.0 / 100.0)
         |    + 0.2 * (1.0 - stop_ratio) AS quality FROM feat),
         |pw AS (SELECT doc_id, $PiiPlantsSql FROM corpus),
         |pii AS (SELECT doc_id, CAST(
         |    len(regexp_extract_all(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
         |    + len(regexp_extract_all(txt, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
         |    + len(regexp_extract_all(txt, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_pii
         |  FROM pw),
         |k AS (SELECT md5(text) h, MIN(doc_id) kid FROM corpus GROUP BY 1)
         |SELECT q.doc_id, q.pred_lang, q.quality, pii.n_pii,
         |  CASE WHEN q.doc_id = k.kid THEN 1 ELSE 0 END AS keeper,
         |  CASE WHEN q.doc_id = k.kid AND q.pred_lang <> 'und'
         |            AND q.quality >= CAST(0.6 AS DOUBLE) AND pii.n_pii = 0
         |       THEN 1 ELSE 0 END AS keep,
         |  CASE WHEN q.doc_id <> k.kid THEN 'dup'
         |       WHEN q.pred_lang = 'und' THEN 'lang'
         |       WHEN q.quality < CAST(0.6 AS DOUBLE) THEN 'quality'
         |       WHEN pii.n_pii > 0 THEN 'pii'
         |       ELSE 'keep' END AS reason
         |FROM q
         |JOIN pii ON pii.doc_id = q.doc_id
         |JOIN k ON md5(q.text) = k.h""".stripMargin
    },

    // Recomputes the decoder's outputs from the synthetic generator's
    // arithmetic (PpmCodec.synthesize): raster byte i = (id*31+i*7)%256,
    // header = "P6\n" (3) + "# c\n" on even ids (4) + "w h\n" (4,
    // single-digit dims) + "255\n" (4).
    "m1_multimodal_meta" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS INT) AS width,
        |    CAST(3 + doc_id % 4 AS INT) AS height,
        |    CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 0 END AS clen
        |  FROM documents),
        |calc AS (
        |  SELECT doc_id, width, height,
        |    width * height * 3 AS npx,
        |    11 + clen AS hlen,
        |    CAST(list_sum(list_transform(generate_series(0, width * height * 3 - 1),
        |      i -> (doc_id * 31 + i * 7) % 256)) AS BIGINT) AS px_sum
        |  FROM base)
        |SELECT doc_id, width, height,
        |  CAST(hlen + npx AS INT) AS n_bytes,
        |  px_sum,
        |  px_sum // npx AS mean_px
        |FROM calc""".stripMargin,

    // Mirrors PpmCodec.downsample2x arithmetically: output pixel (x2,y2,c)
    // is the floor-average of the 2×2 source block; source pixel
    // P(x,y,c) = (id*31 + (3*(y*w+x)+c)*7) % 256. j enumerates the
    // downsampled raster: y2 = j // (rw*3), x2 = (j % (rw*3)) // 3, c = j % 3.
    "m2_multimodal_resize" -> {
      val X = "(((j % (rw * 3)) // 3) * 2)"
      val Y = "((j // (rw * 3)) * 2)"
      def px(xe: String, ye: String) =
        s"(doc_id * 31 + (3 * ($ye * w + $xe) + j % 3) * 7) % 256"
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(4 + doc_id % 5 AS INT) AS w,
         |    CAST(3 + doc_id % 4 AS INT) AS h
         |  FROM documents),
         |dims AS (SELECT doc_id, w, h,
         |    CAST(w // 2 AS INT) AS rw, CAST(h // 2 AS INT) AS rh FROM base),
         |calc AS (
         |  SELECT doc_id, rw, rh,
         |    CAST(COALESCE(list_sum(list_transform(
         |      generate_series(0, rw * rh * 3 - 1), j ->
         |        (${px(X, Y)}
         |         + ${px(s"($X + 1)", Y)}
         |         + ${px(X, s"($Y + 1)")}
         |         + ${px(s"($X + 1)", s"($Y + 1)")}) // 4)), 0) AS BIGINT) AS r_px_sum
         |  FROM dims)
         |SELECT doc_id, rw, rh, r_px_sum FROM calc""".stripMargin
    },

    // Frames are sampled at stride 2: frame 0 always, frame 2 iff the
    // clip has 3 frames (n = 1 + id%3 ∈ {1,2,3}); frame f's raster byte
    // i = (id*31 + f*97 + i*7) % 256.
    "m3_multimodal_frames" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS INT) AS w,
        |    CAST(3 + doc_id % 4 AS INT) AS h,
        |    CAST(1 + doc_id % 3 AS INT) AS n
        |  FROM documents),
        |calc AS (
        |  SELECT doc_id, n,
        |    CAST(COALESCE(list_sum(list_transform(
        |      generate_series(0, w * h * 3 - 1),
        |      i -> (doc_id * 31 + i * 7) % 256)), 0) AS BIGINT) AS s0,
        |    CASE WHEN n = 3 THEN
        |      CAST(COALESCE(list_sum(list_transform(
        |        generate_series(0, w * h * 3 - 1),
        |        i -> (doc_id * 31 + 194 + i * 7) % 256)), 0) AS BIGINT)
        |    ELSE 0 END AS s2
        |  FROM base)
        |SELECT doc_id, n AS n_frames,
        |  CAST((n + 1) // 2 AS INT) AS n_sampled,
        |  s0 + s2 AS sampled_px_sum
        |FROM calc""".stripMargin,

    // Mirrors WavCodec.synthesize arithmetically: sample i =
    // ((id*131 + i*17) % 65536) - 32768; n = 64 + id%37 samples at
    // rate 8000 + (id%4)*4000.
    "m4_multimodal_audio" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |    CAST(64 + doc_id % 37 AS INT) AS n_samples
        |  FROM documents)
        |SELECT doc_id, sample_rate, n_samples,
        |  CAST(list_sum(list_transform(generate_series(0, n_samples - 1),
        |    i -> abs(((doc_id * 131 + i * 17) % 65536) - 32768))) AS BIGINT) AS abs_sum,
        |  CAST(list_max(list_transform(generate_series(0, n_samples - 1),
        |    i -> abs(((doc_id * 131 + i * 17) % 65536) - 32768))) AS INT) AS peak
        |FROM base""".stripMargin,

    // Frame identity recomputed arithmetically (PpmCodec.synthesizeClip:
    // raster byte i = (phase*29 + i*7) mod 256 with phase =
    // (id + frame_idx) mod 8, dims (4 + id%2, 3)) — a frame IS its
    // (w, h, phase) triple, so first-wins grouping on that triple
    // mirrors the engine's grouping on the decoded content hash.
    "m5_frame_dedup" ->
      """WITH f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 3 AS INT))) AS frame_idx
        |  FROM documents),
        |k AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |    CAST(4 + doc_id % 2 AS INT) AS w,
        |    CAST(3 AS INT) AS h,
        |    (doc_id + frame_idx) % 8 AS phase FROM f)
        |SELECT doc_id, frame_idx, w, h,
        |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY w, h, phase
        |         ORDER BY doc_id, frame_idx) = 1 THEN 1 ELSE 0 END AS INT) AS keeper,
        |  COUNT(*) OVER (PARTITION BY w, h, phase) AS group_size
        |FROM k""".stripMargin,

    // The aHash recomputed arithmetically (PpmCodec.synthesizeNoisy +
    // patternBit): per-channel noise is provably below the mean-threshold
    // margin, so the engine's decoded-raster hash equals the clean
    // bit-plan sum Σ 2^j over set bits of pattern p = doc_id mod 257 on
    // the (5 + p%2)×4 grid — the oracle never sees the noise at all.
    "m6_image_phash" ->
      """WITH dims AS (SELECT doc_id, doc_id % 257 AS p,
        |    CAST(5 + (doc_id % 257) % 2 AS INT) AS w, CAST(4 AS INT) AS h
        |  FROM documents),
        |hashed AS (SELECT doc_id, w, h,
        |    CAST(list_sum(list_transform(generate_series(0, w * h - 1),
        |      j -> CASE WHEN j = 0 THEN (1::BIGINT << 0)
        |                WHEN j = 1 THEN 0
        |                WHEN (p * (j + 3) + j * j) % 7 < 3 THEN (1::BIGINT << j)
        |                ELSE 0 END)) AS BIGINT) AS phash
        |  FROM dims)
        |SELECT doc_id, w, h, phash,
        |  CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY w, h, phash)
        |       THEN 1 ELSE 0 END AS INT) AS keeper,
        |  COUNT(*) OVER (PARTITION BY w, h, phash) AS group_size
        |FROM hashed""".stripMargin
  )
}
