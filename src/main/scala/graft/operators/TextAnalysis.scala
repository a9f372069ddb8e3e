package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** L4 — text analysis over the `documents` table (SURVEY.md §2.10):
  * token statistics, term frequencies, language ID, quality scoring,
  * fingerprinting. All map-only scans except term frequency (one
  * hash-partitioned groupBy on the token — the canonical word-count
  * shuffle, partial-aggregated map-side by Catalyst).
  */
object TextAnalysis {

  /** Per-doc token statistics — map-only, codegen'd. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(punctRatio(col("text")), 4).as("punct_ratio"))

  /** Corpus term frequencies, top `limit` by count. */
  def termFrequencies(docs: DataFrame, limit: Int = 50): DataFrame =
    docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(limit)

  /** Heuristic language ID (stopword n-gram voting) next to the labeled
    * `lang` column for eyeball/accuracy checks. */
  def languageId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langGuess(tokens(col("text"))).as("guess"),
      col("lang").as("labeled"))

  /** Composite quality score (length / punctuation / stopword fluency). */
  def qualityScores(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      qualityScore(col("text"), col("n_chars")).as("quality"))

  /** L4p — model-based quality gate: a linear classifier over cheap
    * lexical features (the fasttext-style quality filter of
    * CCNet/C4-era curation, with the learned weights carried as
    * LITERAL data — the same stance as the BPE merge table: training
    * happens offline, the ENGINE's job is applying the model at corpus
    * scale). Emits each doc's feature vector, the decision margin, and
    * the pass flag.
    *
    * Exactness: features are integer counts, weights are integer
    * MICRO-units, and the margin is their BIGINT dot product — no
    * floats anywhere, so the decision boundary replays bit-identically
    * in any engine (the sigmoid is monotone, so margin ≥ 0 IS the
    * class test; nobody needs the probability).
    *
    * Scale shape: map-only — one codegen'd projection over the scan,
    * no shuffle, no broadcast; the model rides into the plan as
    * literals. Swapping in retrained weights is a parameter change. */
  def linearQualityGate(docs: DataFrame,
      wChars: Long = 2000L, wStop: Long = 40000L, wPunct: Long = -30000L,
      wDigit: Long = -15000L, wUpper: Long = -8000L,
      biasMicro: Long = -520000L): DataFrame = {
    val toks = tokens(col("text"))
    def charClassCount(re: String) =
      (length(col("text")) -
        length(regexp_replace(col("text"), re, ""))).cast("long")
    docs.select(col("doc_id"),
        least(length(col("text")), lit(500)).cast("long").as("f_chars"),
        size(filter(toks, t =>
          t.isin(graft.functions.TextFunctions.StopwordsByLang("en"): _*)))
          .cast("long").as("f_stop"),
        charClassCount("[!-/:-@\\[-`{-~]").as("f_punct"),
        charClassCount("[0-9]").as("f_digit"),
        charClassCount("[A-Z]").as("f_upper"))
      .withColumn("margin_micro",
        lit(biasMicro) + lit(wChars) * col("f_chars")
          + lit(wStop) * col("f_stop") + lit(wPunct) * col("f_punct")
          + lit(wDigit) * col("f_digit") + lit(wUpper) * col("f_upper"))
      .withColumn("pass", col("margin_micro") >= 0L)
  }

  /** L4j — robust per-group outlier flagging via median/MAD (the
    * Gopher/FineWeb-style length-distribution gate): a doc is an
    * outlier when |x − median| > k·MAD of its group. Median + MAD,
    * not mean + stddev, because web-scale length distributions are
    * heavy-tailed — one 500 MB doc drags a mean-based gate into
    * keeping every piece of boilerplate under it.
    *
    * Two grouped exact-percentile aggregates (group cardinality is
    * tiny — sources/languages — so the non-partial percentile agg
    * collapses map-side per group) and two broadcast joins back onto
    * the corpus: the fact table never shuffles. Exactness: `value` is
    * integral, so medians land on .0/.5 and every comparison is exact
    * in binary across engines. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    Seq("med", "mad", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — it would collide with the stat joins"))
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Rolling-hash + content fingerprints (dedup keys, doc identity). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      rollingFingerprint(col("text")).as("rolling_fp"),
      contentFingerprint(col("text")).as("content_fp"))

  /** L4d — repetition/boilerplate signals (the Gopher/RefinedWeb-style
    * quality gates: docs dominated by repeated lines or one n-gram are
    * templates/spam, not prose). Integer counts only — numerator and
    * denominator, never the ratio — so the DuckDB twin is float-free
    * and callers pick their own thresholds:
    * duplicate-line fraction = n_dup_lines / n_lines,
    * top-bigram fraction    = top_bigram_n / n_bigrams.
    * Shape at scale: the line stats are map-only; the bigram stats are
    * one (doc_id, bigram) groupBy that partial-aggregates map-side and
    * shuffles at most one row per DISTINCT bigram per doc. */
  def repetition(docs: DataFrame): DataFrame = {
    val linesArr = filter(
      transform(split(col("text"), "\n"), l => trim(l)), l => l =!= "")
    val base = docs.select(col("doc_id"),
      size(linesArr).cast("long").as("n_lines"),
      (size(linesArr) - size(array_distinct(linesArr)))
        .cast("long").as("n_dup_lines"),
      tokens(col("text")).as("_toks"))
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("_toks")) >= 2,
        zip_with(
          slice(col("_toks"), lit(1), size(col("_toks")) - 1),
          slice(col("_toks"), lit(2), size(col("_toks")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val counts = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").cast("long").as("n_bigrams"),
        max("c").cast("long").as("top_bigram_n"))
    base.drop("_toks").join(counts, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bigrams", "top_bigram_n"))
  }

  /** L4f — PII scrubbing (the redaction stage of a curation pipeline):
    * emails and long digit runs (phone/account numbers) are counted and
    * replaced with placeholder tokens. Map-only, two codegen'd regex
    * passes; email replacement runs FIRST so its local-part digits
    * can't be half-eaten by the number rule. Patterns stick to
    * ASCII-class RE2-compatible syntax so the DuckDB twin (with the
    * 'g' flag — DuckDB replaces only the first match by default,
    * Spark replaces all) matches glyph-for-glyph. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val digits = "[0-9]{9,}"
    // count digit runs AFTER email redaction so n_long_numbers equals
    // the <NUM> placeholders actually present in `scrubbed` (digits
    // inside an email local-part are consumed by the email rule and
    // must not be double-reported to a redaction audit)
    val emailScrubbed = regexp_replace(col("text"), email, "<EMAIL>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(email), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(emailScrubbed, lit(digits), lit(0)))
        .cast("long").as("n_long_numbers"),
      regexp_replace(emailScrubbed, digits, "<NUM>").as("scrubbed"))
  }

  /** L4h — inverted-index postings: term → document frequency + the
    * sorted posting list (the retrieval-side artifact of a corpus:
    * search, contamination lookup, and hard-negative mining all read
    * postings, not documents). One (term)-keyed groupBy that partial-
    * aggregates map-side; per-doc tokens are deduplicated BEFORE the
    * shuffle (array_distinct inside the scan), so at most one row per
    * distinct (doc, term) moves. `minDf` drops the hapax tail (the
    * vocabulary's long tail dominates row count, not value — the
    * classic posting-list size bound); the list is rendered as a sorted
    * CSV string, the engine-portable array form.
    *
    * At 100 TB the posting list of a stopword-grade term outgrows one
    * row — the production layout shards postings by `pmod(doc_id, P)`
    * into P rows per hot term (same groupBy, composite key) and
    * readers concat; the single-row form here keeps the oracle exact. */
  def postings(docs: DataFrame, minDf: Long = 2L): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(sort_array(collect_set(col("doc_id"))),
            d => d.cast("string"))).as("posting_csv"))
      .filter(col("df") >= minDf)

  /** L4u — pointwise mutual information of token co-occurrence:
    * which terms appear in the same document far more (or less) often
    * than their document frequencies predict — collocation mining /
    * embedding-free association scoring (Church & Hanks 1990, "Word
    * Association Norms, Mutual Information, and Lexicography").
    * pmi = ln(N · n_ab / (n_a · n_b)) over document-level presence
    * counts, floor-quantized to micro-units.
    *
    * Scale shape: co-occurrence is quadratic in VOCABULARY, not in
    * corpus, so the vocabulary is bounded first — `topV` terms by
    * document frequency (TakeOrdered, deterministic ties) — and
    * BROADCAST back onto the doc-token stream as a semi filter. Each
    * doc then contributes pairs from its ≤ topV-term sorted distinct-
    * token array (in-array explode, the minHashCandidatePairs
    * pattern — no doc self-join), and the (a,b)-keyed count partial-
    * aggregates map-side into at most C(topV,2) keys. `minPairCount`
    * drops the noise tail exactly like postings' minDf. The corpus
    * scan is the only data-sized pass.
    */
  def pmiPairs(docs: DataFrame, topV: Int = 64,
      minPairCount: Long = 5L): DataFrame = {
    require(topV >= 2, s"topV must be >= 2 (got $topV)")
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val vocab = dt.groupBy("tok").agg(count(lit(1)).as("n_t"))
      .orderBy(col("n_t").desc, col("tok")).limit(topV)
    val perDoc = dt.join(broadcast(vocab.select("tok")), "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("tok"))).as("_ts"))
      .filter(size(col("_ts")) >= 2)
    val pairs = perDoc
      .select(explode(flatten(transform(col("_ts"), (a, i) =>
        transform(slice(col("_ts"), i + lit(2), size(col("_ts"))), b =>
          struct(a.as("a_tok"), b.as("b_tok")))))).as("_p"))
      .groupBy(col("_p.a_tok").as("a_tok"), col("_p.b_tok").as("b_tok"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val nDocs = docs.agg(count(lit(1)).as("_n_docs"))
    pairs
      .join(broadcast(vocab.select(col("tok").as("a_tok"),
        col("n_t").as("n_a"))), "a_tok")
      .join(broadcast(vocab.select(col("tok").as("b_tok"),
        col("n_t").as("n_b"))), "b_tok")
      .crossJoin(broadcast(nDocs))
      // factors cast to double BEFORE multiplying (long product wraps
      // silently past 2^63 under non-ANSI Spark; ln needs the ratio)
      .select(col("a_tok"), col("b_tok"), col("n_a"), col("n_b"),
        col("n_ab"),
        floor(log(col("_n_docs").cast("double") * col("n_ab").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          * lit(1000000.0)).cast("long").as("pmi_micro"))
  }

  /** L4i — vocabulary construction: the tokenizer-prep pass that turns
    * a corpus into (term → dense id) with ids assigned by frequency
    * rank (id 1 = most frequent; ties break lexically — fully
    * deterministic, so two builds of the same corpus produce the same
    * vocab). One token-keyed groupBy (map-combined) reduces the corpus
    * to vocabulary size; the dense ranking then runs through
    * [[DenseSequence]] — vocabulary-sized input, but the same
    * no-partitionless-window discipline as every global ordering here
    * (a web-scale vocab is 10⁷–10⁸ rows: still a single-task window if
    * done naively). */
  def vocabulary(docs: DataFrame): DataFrame =
    DenseSequence.withSeq(
      docs.select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("tok")), "id")

  /** L4i — id-encode the corpus against [[vocabulary]]: docs become
    * dense-id sequences (the exact shape a trainer memory-maps).
    * posexplode keeps token order; the vocab table broadcasts (it is
    * ≪ corpus by construction); per-doc sequences reassemble with ONE
    * (doc_id)-keyed aggregate, order restored by the carried position
    * (array_sort on (pos, id) structs — no second window). */
  def encodeIds(docs: DataFrame): DataFrame = {
    val vocab = vocabulary(docs)
    docs.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select(col("tok"), col("id"))), "tok")
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("id")))),
        s => s.getField("id")).as("ids"))
  }

  /** L4k — BM25 retrieval: top-`k` documents for a bag-of-terms query
    * (Robertson/Spärck Jones probabilistic ranking — the scoring half
    * of keyword search over a curation corpus: "find every doc about
    * X" before a filter/inspect pass). Per (doc, term):
    *
    *   idf  = (N − df + 0.5) / (df + 0.5)          [log-free ratio]
    *   tfn  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   score = Σ_terms floor(idf · tfn · 10⁶)       [BIGINT micro-units]
    *
    * The idf keeps Robertson's odds ratio but drops the ln() — a
    * monotone per-term transform that keeps the score rational in
    * (+,−,×,÷,floor), all correctly-rounded IEEE ops, so the DuckDB
    * twin reproduces the exact bit pattern (ln may differ by 1 ulp
    * across libm builds). Per-term contributions quantize to BIGINT
    * micro-units BEFORE the per-doc sum, making the sum order-free —
    * distributed partial-agg order cannot perturb the result.
    *
    * Scale shape: tokens filter to the query terms AT THE EXPLODE (the
    * corpus-sized token stream dies immediately — only query-term hits
    * survive); df is |terms|-sized and broadcasts; the doc-length table
    * joins on doc_id (co-partitioned with tf); the global top-k is
    * TakeOrderedAndProject, never a full sort. */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val dl = docs.select(col("doc_id"), tokenCount(col("text")).cast("long").as("dl"))
    // N and avgdl as a broadcast 1-row join — one lazy plan, no action
    val stats = dl.groupBy().agg(count(lit(1)).as("_n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("_avgdl"))
    val hits = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = hits.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib =
      ((col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      ((col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("_avgdl")))))
    tf.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(contrib * lit(1000000.0)).cast("long").as("contrib_u"))
      .groupBy("doc_id")
      .agg(sum(col("contrib_u")).as("score_u"),
        count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("score_u").desc, col("doc_id"))
      .limit(k)
  }

  /** L4n — OOV-bigram fluency gate: the share of a document's distinct
    * word bigrams NOT found in a reference language model built from
    * the corpus's `lmSize` highest-support bigrams. A log-free fluency
    * proxy (perplexity without the ln(): gibberish and boilerplate both
    * sit far from the high-support bigram mass) — rational arithmetic
    * end to end, so the DuckDB twin is bit-exact.
    *
    * Scale shape: the LM is top-k by (support, gram) — a
    * TakeOrderedAndProject over the map-combined gram counts, never a
    * global sort — and broadcasts (`lmSize` rows) onto the gram stream;
    * the only corpus-wide exchanges are the gram-count groupBy and the
    * per-doc aggregate. */
  def oovBigramRate(docs: DataFrame, lmSize: Int = 1000): DataFrame = {
    require(lmSize > 0, s"lmSize must be positive (got $lmSize)")
    val grams = docs.select(col("doc_id"),
      explode(wordNgrams(col("text"), 2)).as("g"))
    val support = grams.groupBy("g").agg(count(lit(1)).as("n"))
    val lm = support.orderBy(col("n").desc, col("g")).limit(lmSize)
      .select(col("g"), lit(1).as("_in"))
    grams.join(broadcast(lm), Seq("g"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("_in").isNull, 1).otherwise(0)).cast("long").as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_bigrams"), 4) + lit(0.0))
  }

  /** Top-`k` TF-IDF terms per doc. Two aggregations and a join, all on
    * the token key: (doc, tok) term counts; doc frequency per token; a
    * broadcast-able df table joined back; per-doc top-k by score.
    *
    * The score is the division-free rational `tf * N / df` (a monotone
    * transform of tf·(N/df); log-free so the DuckDB twin reproduces the
    * exact double bit pattern — ln() may differ by 1 ulp across libm
    * implementations and flip a rounding boundary). At 100 TB the df
    * table is |vocabulary|-sized (≪ corpus, broadcastable) and both
    * groupBys partial-aggregate map-side; the window runs per doc_id
    * partition — no global shuffle beyond the token groupBys. */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // corpus size as a broadcast 1-row join, NOT a driver-side count():
    // keeps the whole computation one lazy plan (no extra action) and
    // stays distributed at any scale
    val n = docs.groupBy().agg(count(lit(1)).as("_n"))
    val docToks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = docToks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = docToks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round((col("tf") * col("_n")).cast("double") / col("df"), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rnk").cast("long").as("rnk"))
  }

  /** L4s — bigram language-model quality scoring (the CCNet filter,
    * Wenzek et al. 2020: score every document under an LM trained on a
    * trusted reference slice; low average negative log-likelihood ≈
    * fluent in the reference register). The model is add-one-smoothed
    * bigram counts:
    *
    *   p(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V),   V = |ref vocab| + 1
    *
    * Per-bigram log-probs quantize to integer MICRO-units before the
    * per-doc sum (the BM25/DSIR pre-sum idiom) so document scores are
    * exact integers — order-free and engine-replayable (mix_dsir proved
    * ln() replays bit-for-bit against DuckDB).
    *
    * 100 TB shape: unlike DSIR's bounded hashed model (a broadcast
    * literal), this model is vocabulary-sized — the honest shape is two
    * map-combined count aggregates JOINED back on the gram key
    * (sort-merge at scale, AQE-broadcast when small). The doc side
    * pre-aggregates (doc, gram) multiplicity before the model join, so
    * join input is distinct grams per doc, not raw token positions, and
    * the vocab scalar enters as a 1-row broadcast, never an action. */
  /** L4w — readability scoring (Flesch reading ease with the standard
    * vowel-GROUP syllable heuristic): the grade-level quality feature
    * every curation stack keeps next to length/punct ratios. Sentences
    * count as terminator RUNS (one regexp_count — "?!" is one
    * boundary), clamped to ≥1 so fragment docs score rather than
    * divide by zero. The score lands as an integer milli-unit floor:
    * two exact integer→double divisions and two multiplications, all
    * correctly-rounded IEEE — engine-replayable. Map-only, codegen'd:
    * three regex passes per row inside the scan, no shuffle. */
  def readability(docs: DataFrame): DataFrame = {
    val words = tokenCount(col("text")).cast("long")
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val syllables = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    docs.select(col("doc_id"), words.as("n_words"), sentences.as("n_sentences"),
      syllables.as("n_syllables"),
      when(words > 0,
        floor((lit(206.835)
          - lit(1.015) * (words.cast("double") / sentences.cast("double"))
          - lit(84.6) * (syllables.cast("double") / words.cast("double")))
          * lit(1000.0)).cast("long"))
        .as("flesch_milli"))
  }

  /** L4t — per-source unigram KL divergence vs the corpus-wide token
    * distribution: the mixing diagnostic that says WHICH sources pull
    * the blend off-distribution and by how much (a16's TVD compares
    * two snapshots of one categorical; this compares every source's
    * whole vocabulary against the pooled corpus). Add-one smoothing on
    * both sides; reported as the scaled integer
    *
    *   kl_scaled_micro(s) = Σ_t c_st · ⌊ln( ((c_st+1)·(N_c+V)) /
    *                                        ((c_ct+1)·(N_s+V)) )·10⁶⌋
    *
    * (≈ N_s·KL(p_s‖p_c) in micro-nats — per-token floors BEFORE the
    * weighted sum, so the score is an exact order-free integer), plus
    * the per-source normalization ⌊scaled/N_s⌋ ≈ KL in micro-nats.
    *
    * 100 TB shape: two map-combined token-count aggregates (per-source
    * and pooled) joined on the token key — vocabulary-sized, never
    * row-sized; per-source totals broadcast (|sources| rows); the
    * pooled total + vocab size is a 1-row scalar join. */
  def unigramKl(docs: DataFrame, sourceCol: String = "source"): DataFrame = {
    val tok = docs.select(col(sourceCol).as("src"),
      explode(tokens(col("text"))).as("t"))
    // EAGER checkpoint (r16): st feeds three consumers (the pooled ct
    // fold, the per-source totals, and the final join), and each
    // acquires different pushed isnotnull filters — the subtrees stop
    // being canonically equal, so runtime exchange reuse does NOT fire
    // and the corpus-wide tokenize+explode+aggregate executed once per
    // consumer (seen in executed-plan metrics). The table is bounded
    // (sources × vocab), so materializing it once is the scale-safe
    // trade; eager because multiple AQE stages racing a lazy
    // checkpoint recompute the same blocks (the kCore lesson).
    val st = Checkpoint(
      tok.groupBy("src", "t").agg(count(lit(1)).as("c_st")))
    // pooled per-token counts FOLD the per-source aggregate instead of
    // re-exploding the corpus (r16, guide §2.3): Σ_src c_st ≡ c_ct by
    // definition, so the second pass shuffles O(sources × vocab)
    // pre-aggregated rows, not O(corpus tokens) exploded ones
    val ct = st.groupBy("t").agg(sum("c_st").as("c_ct"))
    val ns = st.groupBy("src").agg(sum("c_st").as("n_s"),
      count(lit(1)).as("n_distinct_toks"))
    val scal = ct.agg(sum("c_ct").as("n_c"), count(lit(1)).as("v"))
    st.join(ct, "t")
      .join(broadcast(ns), "src")
      .crossJoin(broadcast(scal))
      // each factor cast to double BEFORE the product: a LONG product
      // of (c_st+1)·(n_c+v) wraps silently past 2^63 under non-ANSI
      // Spark at extreme corpus scale (pooled counts ~1e13 × large
      // per-token counts); the log only needs the RATIO, so double
      // rounding of the factors (exact below 2^53 anyway) is harmless
      .withColumn("_lr_micro",
        floor(log((col("c_st") + 1).cast("double") * (col("n_c") + col("v")).cast("double") /
          ((col("c_ct") + 1).cast("double") * (col("n_s") + col("v")).cast("double")))
          * lit(1000000.0)).cast("long"))
      .groupBy("src")
      // integer bound (the Eval.rocAuc discipline): |_lr_micro| ≤
      // ln(max ratio)·1e6 ≲ 62e6, so Σ c_st·_lr_micro stays below 2^63
      // while n_s < 1.5e11 tokens per source — beyond that, pre-scale
      // _lr_micro down (the score is a floor-quantized estimate anyway)
      .agg(first("n_s").as("n_tokens"),
        first("n_distinct_toks").as("n_distinct_toks"),
        sum(col("c_st") * col("_lr_micro")).as("kl_scaled_micro"))
      .withColumn("kl_micro",
        floor(col("kl_scaled_micro").cast("double") /
          col("n_tokens").cast("double")).cast("long"))
      .withColumnRenamed("src", sourceCol)
  }

  def lmScore(corpus: DataFrame, reference: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n1 = greatest(size(toks) - 1, lit(0))
    // NON-distinct adjacent bigrams (an LM needs multiplicity;
    // wordNgrams dedups for set semantics)
    val grams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val refG = reference.select(explode(grams).as("g"))
    // EAGER checkpoint (r16): big feeds both the doc-gram join (which
    // pushes isnotnull(g) into it) and the unigram-context fold below
    // (which pushes isnotnull on the w1 prefix) — the differing pushed
    // filters break canonical subtree equality, so the reference-wide
    // bigram explode+aggregate executed TWICE at runtime (executed-plan
    // metrics: two 28k-row exchanges over two Generate nodes, only the
    // scan exchange reused). The distinct-bigram table is
    // vocab²-bounded; materialize it once for both consumers.
    val big = Checkpoint(refG.groupBy("g").agg(count(lit(1)).as("cb")))
    // unigram-context counts FOLD the bigram aggregate instead of
    // re-tokenizing the reference (r16, guide §2.3): Σ_{g: w1(g)=w}
    // cb ≡ count of bigram instances starting with w (tokens carry no
    // spaces, so the prefix split is exact). The reference corpus is
    // now exploded for bigrams ONCE, and this shuffle carries
    // O(distinct bigrams), not O(reference tokens)
    val uni = big
      .groupBy(element_at(split(col("g"), " ", 2), 1).as("w1"))
      .agg(sum("cb").as("cu"))
    val vocab = reference.select(explode(toks).as("t")).distinct()
      .agg((count(lit(1)) + lit(1L)).as("v")) // +1 = the UNK type
    val docG = corpus
      .select(col("doc_id"), explode(grams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("k"))
      .withColumn("w1", element_at(split(col("g"), " ", 2), 1))
    val scored = docG
      .join(big, Seq("g"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_micro",
        floor(log((coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast("double"))
          * lit(1000000.0)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_bigrams"),
        (-sum(col("lp_micro") * col("k"))).as("nll_micro"))
    corpus.select("doc_id", "lang")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        when(col("n_bigrams") > 0,
          floor(col("nll_micro").cast("double") / col("n_bigrams"))
            .cast("long")).as("avg_nll_micro"))
  }
}
