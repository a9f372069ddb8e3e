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

  /** Token count — whitespace tokens of the raw text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** A BPE-ish subword count estimate: words + punctuation runs counted
    * separately (a cheap stand-in for a real tokenizer's fertility). */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) +
      size(filter(split(text, ""), c => c.rlike("^[\\p{Punct}]$")))

  /** Character k-shingles of the lowercased text (overlapping substrings
    * of length k) — the MinHash/Jaccard unit. Distinct set; empty array
    * when the text is shorter than k (Spark `sequence` descends when
    * start > stop, so guard explicitly — the DuckDB twin's
    * generate_series(1,0) is empty). */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(text)
    array_distinct(
      when(length(t) >= k,
        transform(sequence(lit(1), length(t) - (k - 1)),
          i => substring(t, i, lit(k))))
        .otherwise(array().cast("array<string>")))
  }

  /** Word n-grams as joined strings (token-level shingles). Distinct
    * set; empty when fewer than n tokens (same guard as charShingles). */
  def wordNgrams(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** Deterministic 60-bit hash of a string with a seed, built from md5 so
    * the DuckDB oracle can reproduce it bit-for-bit:
    * Spark  : conv(substr(md5(concat(seed,':',s)),1,15),16,10)::long
    * DuckDB : ('0x' || substr(md5(seed||':'||s),1,15))::BIGINT            */
  def md5Hash60(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10).cast("long")

  /** MinHash signature: for each of `numHashes` seeds, the min md5Hash60
    * over the shingle set. Empty shingle set → nulls. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shingles, s => md5Hash60(s, seed)))): _*)

  /** SimHash over tokens: 32-bit fingerprint where bit i is the sign of
    * the sum over tokens of (+1 if token-hash bit i set else -1).
    * Expressed as pure array algebra (no UDF). */
  def simHash32(toks: Column): Column = {
    // per-token 60-bit hash, reused across all 32 bit tests
    val th = transform(toks, t => md5Hash60(t, 0))
    val bitSums = (0 until 32).map { i =>
      aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, i)) =>
      acc + when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two string arrays (distinct-set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
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
    when(n === 0.0, lit(0.0)).otherwise(
      size(filter(split(text, ""), c => c.rlike("^[\\p{Punct}]$"))).cast("double") / n)
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
