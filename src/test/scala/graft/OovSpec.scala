package graft

import graft.operators.TextAnalysis

/** OOV-bigram fluency gate: hand-model rates, LM tie determinism, and
  * short-document edge cases. */
class OovSpec extends SparkTestBase {
  import spark.implicits._

  test("rates match the hand model; the LM is the top-k by (support, gram)") {
    // corpus bigram support: "a b" in d1,d2,d3 (3); "b c" in d1,d2 (2);
    // "c z" in d3 (1); "z q" in d3 (1). lmSize=2 → LM = {"a b", "b c"}
    val docs = Seq(
      (1L, "a b c"),     // grams: "a b","b c" → 0 OOV of 2
      (2L, "a b c"),     // same
      (3L, "a b c z q")) // grams: "a b","b c","c z","z q" → 2 OOV of 4
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovBigramRate(docs, lmSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 0L, 0.0)),
      2L -> ((2L, 0L, 0.0)),
      3L -> ((4L, 2L, 0.5))))
  }

  test("LM ties break lexically: equal-support grams admit deterministically") {
    // all four grams have support 1; lmSize=2 must take "a b","a c"
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b d"), (4L, "c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovBigramRate(docs, lmSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("documents with fewer than two tokens drop out instead of dividing by zero") {
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.oovBigramRate(docs, lmSize = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }

  test("repeated bigrams within one doc count once (distinct-set semantics)") {
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // tokens: a b a b a b → distinct bigrams {"a b", "b a"}
    val got = TextAnalysis.oovBigramRate(docs, lmSize = 1)
      .collect().head
    assert(got.getLong(1) == 2L, s"distinct bigrams expected: $got")
  }

  test("lmScore: add-one bigram model matches the hand computation") {
    def micro(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
    // reference = the one 'en' doc: grams {the cat, cat sat}, contexts
    // {the→1, cat→1}, vocab = {the,cat,sat} + UNK = 4
    val docs = Seq(
      (1L, "en", "the cat sat"),   // in-model: both grams seen
      (2L, "xx", "zz qq rr"),      // fully unseen: ln(1/4) per gram
      (3L, "xx", "the dog"),       // seen context, unseen gram: ln(1/5)
      (4L, "xx", "the")            // <2 tokens: no bigrams
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis
      .lmScore(docs, docs.filter(org.apache.spark.sql.functions.col("lang") === "en"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    val inLp = micro(2.0 / 5.0)       // (1+1)/(1+4)
    val oovLp = micro(1.0 / 4.0)      // (0+1)/(0+4)
    val mixLp = micro(1.0 / 5.0)      // (0+1)/(1+4)
    assert(got(1L) == ((2L, -2 * inLp, Some(-inLp))))
    assert(got(2L) == ((2L, -2 * oovLp, Some(-oovLp))))
    assert(got(3L) == ((1L, -mixLp, Some(-mixLp))))
    assert(got(4L) == ((0L, 0L, None)))
    // the fluency ordering CCNet filters on: in-register < unseen
    assert(got(1L)._3.get < got(2L)._3.get)
  }
}
