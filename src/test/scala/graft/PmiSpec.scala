package graft

import graft.operators.TextAnalysis

/** PMI collocation mining (L4u) against hand-computed presence
  * counts on a planted corpus. */
class PmiSpec extends SparkTestBase {
  import spark.implicits._

  // presence counts (N = 8 docs): alpha 6, beta 4, gamma 4, delta 2;
  // co-occurrence: (alpha,beta) 4, (alpha,gamma) 2, (gamma,delta) 2
  private lazy val docs = Seq(
    (1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha beta"),
    (4L, "alpha beta beta"),
    (5L, "alpha gamma"), (6L, "gamma alpha"),
    (7L, "gamma delta"), (8L, "delta gamma"))
    .toDF("doc_id", "text")

  private def micro(n: Long, nab: Long, na: Long, nb: Long): Long =
    math.floor(math.log(n.toDouble * nab / (na.toDouble * nb)) * 1e6).toLong

  test("PMI matches hand-computed presence counts (repeats ignored)") {
    val got = TextAnalysis.pmiPairs(docs, topV = 10, minPairCount = 2L)
      .orderBy("a_tok", "b_tok").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == Set(("alpha", "beta"), ("alpha", "gamma"),
      ("delta", "gamma")), s"pairs: ${got.keySet}")
    assert(got(("alpha", "beta")) ==
      ((6L, 4L, 4L, micro(8, 4, 6, 4))), "positive association")
    assert(got(("alpha", "gamma")) ==
      ((6L, 4L, 2L, micro(8, 2, 6, 4))), "negative association")
    assert(got(("delta", "gamma")) ==
      ((2L, 4L, 2L, micro(8, 2, 2, 4))), "ln(2) pair")
    assert(got(("alpha", "beta"))._4 > 0 && got(("alpha", "gamma"))._4 < 0,
      "signs: co-occurring above/below independence expectation")
  }

  test("topV bounds the vocabulary (DF-desc, lexical ties) and minPairCount prunes") {
    // topV=2 keeps alpha (6) and the beta/gamma DF-tie lexically ->
    // beta; only (alpha, beta) can survive
    val trimmed = TextAnalysis.pmiPairs(docs, topV = 2, minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(trimmed.toSeq == Seq(("alpha", "beta")))
    val pruned = TextAnalysis.pmiPairs(docs, topV = 10, minPairCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pruned.toSeq == Seq(("alpha", "beta")),
      "minPairCount=3 drops the count-2 pairs")
  }
}
