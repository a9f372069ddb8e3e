package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library (SURVEY.md §2.10 L4 + north-star
  * text operators): tokenization, shingling, language-ID heuristic,
  * quality scoring, fingerprinting. Pure `functions._` — every operator
  * stays inside whole-stage codegen and is reproducible in ANSI SQL for
  * the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokenizer (lowercased). `\s+` split; leading/trailing
    * trimmed first so no empty edge tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Accent-fold table for [[normalizeText]] — the common Latin-1/Latin
    * Extended accented letters, folded to ASCII. `translate` is a
    * codegen'd char-map (no regex) and exists verbatim in DuckDB, so the
    * oracle replays the same fold. */
  val AccentedChars = "áàâäãåéèêëíìîïóòôöõúùûüýÿñç"
  val AccentFolded = "aaaaaaeeeeiiiiooooouuuuyync"

  /** Canonical text normalization — the first stage of every curation
    * pipeline (dedup keys, tokenizer input, language ID all want one
    * canonical form): lowercase → fold accents → strip ASCII control
    * chars → collapse whitespace runs → trim. One pass per step, all
    * codegen'd; map-only (no shuffle) at any scale. The control-char
    * class is spelled explicitly ([\x00-\x1F\x7F]) instead of \p{Cntrl}:
    * RE2 (DuckDB) has no \p{Cntrl}, and the explicit class means both
    * engines run the identical automaton. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(lower(text), AccentedChars, AccentFolded),
        "[\\x00-\\x1F\\x7F]", " "),
      " +", " "))

  /** Token count — whitespace tokens of the raw text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Count of ASCII-punctuation characters — ONE regex pass (the
    * split-per-char + per-char rlike formulation ran a regex per
    * character). Class matches the DuckDB twin's '[!-/:-@\[-`{-~]'. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** A BPE-ish subword count estimate: words + punctuation chars counted
    * separately (a cheap stand-in for a real tokenizer's fertility). */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) + punctCount(text)

  /** GPT-2-style pre-tokenizer unit count — letter runs, single digits,
    * single non-alnum glyphs (the units a byte-pair encoder would merge
    * FROM; an upper bound on BPE token count, the budget number a
    * packing/costing pipeline needs). One codegen'd regex pass. The
    * whitespace class is spelled out EXPLICITLY (incl. \\x0B) rather
    * than \\s: Java's \\s contains vertical tab, RE2's does not, so \\s
    * would silently diverge from the DuckDB twin on \\x0B glyphs. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Learned BPE merge table — LITERAL data (provenance: BpeTrain over
    * the sf0.01 documents corpus, 48 merges, self-pairs excluded so the
    * rewrite is confluent and replayable; see BpeExprs for the exact
    * semantics). Being literal keeps the tokenizer — and the DuckDB
    * recursive-CTE oracle that interpolates these pairs — a pure
    * function of the code. */
  val DefaultBpeMerges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"))

  /** Merged-BPE token count: pre-tokenize with [[BpePattern]], then
    * apply the ranked merge table within each unit (one-pass-per-rank —
    * exact BPE for a learned table; BpeExprs documents the proof) and
    * count the surviving symbols. The REAL token budget for packing /
    * manifest costing; [[bpeTokenCount]] stays as the merge-free upper
    * bound. Native expression, per-thread LRU over distinct units. */
  def bpeMergedTokenCount(text: Column,
      merges: Seq[(String, String)] = DefaultBpeMerges): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.BpeMergedCountExpr(
        org.apache.spark.sql.graft.Bridge.expression(text),
        merges.map(_._1), merges.map(_._2), BpePattern))

  /** Merged-BPE token SEQUENCE, space-joined — the tokenizer's apply
    * step ([[bpeMergedTokenCount]] is its length). Same merge table,
    * same native one-pass-per-rank semantics, so the same recursive-CTE
    * oracle replays the full sequence, not just the count. */
  def bpeEncode(text: Column,
      merges: Seq[(String, String)] = DefaultBpeMerges): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.BpeEncodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(text),
        merges.map(_._1), merges.map(_._2), BpePattern))

  /** Character k-shingles of the lowercased text (overlapping substrings
    * of length k) — the MinHash/Jaccard unit. Distinct set; empty array
    * when the text is shorter than k (Spark `sequence` descends when
    * start > stop, so guard explicitly — the DuckDB twin's
    * generate_series(1,0) is empty). */
  def charShingles(text: Column, k: Int): Column =
    shinglesOfLowered(lower(text), k)

  /** charShingles over an ALREADY-LOWERED column. Callers on hot paths
    * materialize `lower(text)` as its own projection first: a lambda
    * body re-evaluates every non-lambda subexpression per array element,
    * so an inline `lower(text)` would run once per shingle position
    * (~n_chars times per row) instead of once per row. */
  def shinglesOfLowered(t: Column, k: Int): Column =
    array_distinct(
      when(length(t) >= k,
        transform(sequence(lit(1), length(t) - (k - 1)),
          i => substring(t, i, lit(k))))
        .otherwise(array().cast("array<string>")))

  /** Word n-grams as joined strings (token-level shingles). Distinct
    * set; empty when fewer than n tokens (same guard as charShingles). */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsOfTokens(tokens(text), n)

  /** wordNgrams over an already-tokenized column (same hot-path
    * rationale as shinglesOfLowered — materialize `tokens(text)` first). */
  def ngramsOfTokens(ts: Column, n: Int): Column =
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))

  /** Deterministic 60-bit hash of a string with a seed, built from md5 so
    * the DuckDB oracle can reproduce it bit-for-bit:
    * Spark  : conv(substr(md5(concat(seed,':',s)),1,15),16,10)::long
    * DuckDB : ('0x' || substr(md5(seed||':'||s),1,15))::BIGINT            */
  def md5Hash60(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10).cast("long")

  /** MinHash signature: for each of `numHashes` seeds, the min md5Hash60
    * over the shingle set. Empty shingle set → nulls. Native one-pass
    * expression (MinHashSigExpr) — value-identical to the per-seed
    * `array_min(transform(...))` formulation the DuckDB oracle replays,
    * without k array passes and md5→hex→conv string round-trips. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.MinHashSigExpr(
        org.apache.spark.sql.graft.Bridge.expression(shingles), numHashes))

  /** md5 paired-digest MinHash: numHashes replayable hashes from
    * ceil(numHashes/2) digests — hash 2d/2d+1 are hex chars 1-15 /
    * 16-30 of md5(d":"+shingle) (MinHashSigPairedExpr). The banded
    * near-dup oracle replays both substrings. */
  def pairedMinHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.MinHashSigPairedExpr(
        org.apache.spark.sql.graft.Bridge.expression(shingles), numHashes))

  /** md5×multiply MinHash: ONE md5 per shingle (60-bit replayable
    * base) + `numHashes` wrapping multiplies by fixed odd constants
    * (MinHashSigMulExpr.Mixers — the DuckDB twin interpolates the same
    * literals and reproduces Java's long wrap in HUGEINT-mod
    * arithmetic). The fast oracle-facing banding family since r7: the
    * paired-digest family above costs ceil(numHashes/2) md5s per
    * shingle, this costs one. */
  def mulMinHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.MinHashSigMulExpr(
        org.apache.spark.sql.graft.Bridge.expression(shingles), numHashes))

  /** [[mulMinHashSignature]] straight from the LOWERED text — the k-char
    * windows walk the UTF-8 bytes in place (no shingle string array),
    * value-identical to the list form. Null signature when the text is
    * shorter than k chars. */
  def mulMinHashSignatureOfText(loweredText: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.MinHashSigMulTextExpr(
        org.apache.spark.sql.graft.Bridge.expression(loweredText), k, numHashes))

  /** Fast MinHash family for the LSH scale path: one 32-bit content hash
    * per shingle + `numHashes` splitmix64 remixes (XxMinHashSigExpr).
    * Not oracle-checked (LSH banding only needs self-consistency); the
    * md5 family above stays the oracle-facing signature. */
  def xxMinHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.XxMinHashSigExpr(
        org.apache.spark.sql.graft.Bridge.expression(shingles), numHashes))

  /** SimHash over tokens: 60-bit fingerprint where bit i is the sign of
    * the sum over tokens of (+1 if md5Hash60-bit i set else −1).
    *
    * Native single-pass Catalyst expression (SimHash60Expr): one md5 per
    * token. The pure-Column formulation (an `aggregate` per bit) inlined
    * the token-hash array into every branch — 60 md5 passes per row —
    * and ran interpreted; measured 60× slower at sf0.1. 60 bits (not 64)
    * because the oracle twin rebuilds the sketch from md5Hash60, whose
    * range is 15 hex chars, and a signed BIGINT holds it without
    * overflow. */
  def simHash60(toks: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.SimHash60Expr(
        org.apache.spark.sql.graft.Bridge.expression(toks)))

  /** Sorted distinct xx-hashed char k-shingles straight from the
    * (already-lowered) text — the string-free equivalent of
    * hashedSortedSet(shinglesOfLowered(t, k)): one byte walk, zero
    * per-shingle string allocation (HashedShinglesExpr). Jaccard over
    * these sets equals Jaccard over the string shingle sets modulo
    * 64-bit collisions; pair with longMinHashSignature for an
    * end-to-end string-free LSH path. */
  def hashedShingles(lowered: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HashedShinglesExpr(
        org.apache.spark.sql.graft.Bridge.expression(lowered), k))

  /** MinHash signature over an already-hashed shingle set (array<long>,
    * e.g. hashedShingles output): numHashes splitmix64 remixes per
    * element, no strings (LongMinHashSigExpr). Same empty→nulls
    * contract as the string families. */
  def longMinHashSignature(hashedSet: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.LongMinHashSigExpr(
        org.apache.spark.sql.graft.Bridge.expression(hashedSet), numHashes))

  /** Hashed distinct-set representation for fast pair verification:
    * xxhash64 each element, sort. Set relations are preserved modulo
    * 64-bit collisions (P ≈ n²/2⁶⁴ per pair — negligible); intersection
    * then runs as a native merge-count (sortedIntersectCount). */
  def hashedSortedSet(arr: Column): Column =
    sort_array(transform(arr, e => xxhash64(e)))

  /** |A∩B| of two sorted long arrays — native merge loop. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.SortedLongIntersectCountExpr(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Jaccard of two hashedSortedSet columns: i / (|A|+|B|−i). */
  def hashedJaccard(a: Column, b: Column): Column = {
    val i = sortedIntersectCount(a, b).cast("double")
    val u = size(a).cast("double") + size(b).cast("double") - i
    when(u === 0.0, lit(0.0)).otherwise(i / u)
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two distinct-element arrays. Inputs MUST be
    * duplicate-free (charShingles/wordNgrams are): |A∪B| is then
    * |A|+|B|−|A∩B|, so only ONE hash-set pass (array_intersect) runs per
    * pair instead of intersect + union. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a).cast("double") + size(b).cast("double") - inter
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  // ---- language ID (n-gram/stopword heuristic) ----

  /** Tiny per-language stopword lists; public common-word sets. */
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "se"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "dans", "est", "pour"))

  /** Stopword-hit count for one language over a token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(array_distinct(toks),
      array(StopwordsByLang(lang).map(lit): _*)))

  /** Heuristic language guess: argmax of stopword hits, 'und' when all
    * zero. Deterministic tie-break by language-code order. */
  def langGuess(toks: Column): Column = {
    val langs = StopwordsByLang.keys.toSeq.sorted
    val best = langs.foldLeft((lit("und"), lit(0))) { case ((bl, bs), l) =>
      val s = stopwordHits(toks, l)
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    best._1
  }

  // ---- quality scoring ----

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text).cast("double")
    when(n === 0.0, lit(0.0)).otherwise(punctCount(text).cast("double") / n)
  }

  /** Mean token length in characters (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** English-stopword density — a classic fluency proxy (C4/Gopher rules). */
  def stopwordDensity(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => t.isin(StopwordsByLang("en"): _*)))
        .cast("double") / size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: blend of length signal, low punct
    * noise, and stopword fluency. Fixed public-heuristic weights. */
  def qualityScore(text: Column, nChars: Column): Column =
    round(
      least(lit(1.0), nChars.cast("double") / lit(500.0)) * lit(0.4)
        + (lit(1.0) - least(lit(1.0), punctRatio(text) * lit(5.0))) * lit(0.3)
        + least(lit(1.0), stopwordDensity(text) * lit(4.0)) * lit(0.3),
      4)

  // ---- fingerprinting ----

  /** Polynomial rolling hash of the full text, mod 1e9+7 (kept in range so
    * the DuckDB twin never overflows BIGINT): fold over characters of
    * acc*31 + codepoint. */
  def rollingFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % lit(1000000007L))

  /** Content fingerprint for exact dedup: sha256 hex of the
    * whitespace-normalized lowercased text. */
  def contentFingerprint(text: Column): Column =
    sha2(array_join(tokens(text), " "), 256)
}
