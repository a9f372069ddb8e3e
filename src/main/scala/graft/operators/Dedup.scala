package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators (SURVEY.md §2.10 L1/L2 — north-star LLM
  * pipeline). Every variant is shuffle-architected for 100 TB:
  *   - exact:   one hash-partitioned groupBy on a 256-bit fingerprint —
  *     no full-text shuffle (fingerprint first, text dropped before the
  *     exchange when only ids are needed).
  *   - minhash: signatures are computed scan-side (map-only), candidate
  *     pairs come from an equi-groupBy on band keys — never a crossJoin.
  *     Bucket-internal pairing is quadratic only in bucket size.
  *   - simhash: same banding idea over 8-bit chunks of a 32-bit sketch.
  *   - ngram-jaccard: exact verify, restricted to an equi-partitionable
  *     block key (e.g. source) so the join stays co-partitioned.
  *   - embedding: exact cosine over block-bounded pairs; the scale path
  *     swaps the block for an LSH bucket (see Similarity.rhpBucket).
  */
object Dedup {

  /** L1 — exact dedup groups: one row per distinct normalized content,
    * with the surviving doc (min id) and the duplicate count. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .select(contentFingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))

  /** L1 applied: keep exactly one doc per fingerprint (distributed — a
    * single aggregate, no window over the full corpus). */
  def dropExactDuplicates(docs: DataFrame): DataFrame =
    docs.join(
      exactGroups(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** L2 — per-doc MinHash signature (k-char shingles, `numHashes` md5
    * seeds). Map-only; the signature is the only thing that shuffles. */
  def minHashSignatures(docs: DataFrame, k: Int = 5, numHashes: Int = 8): DataFrame =
    docs.select(col("doc_id"),
      minHashSignature(charShingles(col("text"), k), numHashes).as("sig"))

  /** L2 — LSH candidate pairs: split the signature into `bands` bands of
    * `numHashes/bands` rows; docs sharing any full band land in one
    * bucket (equi-shuffle on the band key), pairs are enumerated inside
    * buckets only. Returns distinct (a_id, b_id), a<b. */
  def minHashCandidatePairs(docs: DataFrame, k: Int = 5,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minHashSignatures(docs, k, numHashes)
    val banded = sigs.select(col("doc_id"), posexplode(
      array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("key"))): _*)))
      .select(col("doc_id"), col("col.band").as("band"), col("col.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** L2 — MinHash near-dup pairs, LSH candidates verified with the exact
    * shingle-set Jaccard (candidates only — the exact check never sees a
    * non-colliding pair). */
  def minHashNearDups(docs: DataFrame, k: Int = 5, numHashes: Int = 8,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), charShingles(col("text"), k).as("sh"))
    minHashCandidatePairs(docs, k, numHashes, bands)
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_sh"), col("b_sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** L2 — per-doc 32-bit SimHash sketch over tokens. */
  def simHashSketches(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simHash32(tokens(col("text"))).as("simhash"))

  /** L2 — SimHash near-dups: band the 32-bit sketch into four 8-bit
    * chunks (pigeonhole: hamming ≤3 ⇒ some chunk equal), bucket-join on
    * chunks, verify with exact hamming distance. */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sk = simHashSketches(docs)
    val banded = sk.select(col("doc_id"), col("simhash"), posexplode(
        array((0 until 4).map(i =>
          shiftright(col("simhash"), i * 8).bitwiseAND(lit(0xffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        hammingDist(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** L2 — exact word-n-gram Jaccard over block-bounded pairs (equi-join
    * on the block column keeps the pair space co-partitioned; at 100 TB
    * the block is an LSH band or length bucket, never the whole corpus). */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val g = docs.select(col("doc_id"), col(blockCol).as("blk"),
      wordNgrams(col("text"), n).as("ng"))
    g.as("a").join(g.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        round(jaccard(col("a.ng"), col("b.ng")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** L2 — embedding-cosine near-dups, exact within blocks. `blockExpr`
    * bounds the pair space (lit(1) = brute force for small/oracle runs;
    * an LSH bucket for scale). */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
      blockExpr: Column = lit(1)): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"), blockExpr.as("blk"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(cosine(col("a.embedding"), col("b.embedding")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
