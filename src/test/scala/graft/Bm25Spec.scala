package graft

import graft.operators.TextAnalysis

/** BM25 retrieval: exact agreement with a single-threaded reference of
  * the same quantized scoring, plus containment/ordering semantics. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a"),        // tf(a)=2 tf(b)=1 dl=3
    (2L, "a c"),          // tf(a)=1        dl=2
    (3L, "b b b b"),      // tf(b)=4        dl=4
    (4L, "z z z"),        // no query terms dl=3
    (5L, ""))             // empty          dl=0
    .toDF("doc_id", "text")

  /** The operator's exact arithmetic, single-threaded. */
  private def reference(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, (Long, Long)] = {
    def toks(t: String): Seq[String] =
      if (t.trim.isEmpty) Seq.empty else t.trim.toLowerCase.split("\\s+").toSeq
    val n = docs.size.toLong
    val dl = docs.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf = docs.flatMap { case (id, t) =>
      toks(t).filter(terms.contains).groupBy(identity)
        .map { case (tok, os) => (id, tok, os.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (tok, rs) => tok -> rs.size.toLong }
    tf.groupBy(_._1).map { case (id, rs) =>
      val contribs = rs.map { case (_, tok, f) =>
        val idf = (n - df(tok) + 0.5) / (df(tok) + 0.5)
        val tfn = (f * (k1 + 1.0)) /
          (f + k1 * ((1.0 - b) + b * (dl(id) / avgdl)))
        math.floor(idf * tfn * 1000000.0).toLong
      }
      id -> (contribs.sum, rs.size.toLong)
    }
  }

  test("matches the single-threaded quantized reference exactly") {
    val got = TextAnalysis.bm25TopDocs(corpus, Seq("a", "b"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b b"),
      (4L, "z z z"), (5L, ""))
    assert(got == reference(docs, Seq("a", "b")))
  }

  test("docs without any query term never appear; k caps the result") {
    val all = TextAnalysis.bm25TopDocs(corpus, Seq("a", "b"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L), "only term-matching docs score")
    val top1 = TextAnalysis.bm25TopDocs(corpus, Seq("a", "b"), k = 1).collect()
    assert(top1.length == 1)
  }

  test("ranking: more matched terms beat one saturated term; ties break by doc_id") {
    val rows = TextAnalysis.bm25TopDocs(corpus, Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // d1 matches both terms; saturation (k1) keeps d3's four b's from
    // overtaking two distinct-term contributions
    assert(rows.head._1 == 1L, s"expected doc 1 first: ${rows.toSeq}")
    val scores = rows.map(_._2)
    assert(scores.sameElements(scores.sortBy(-_)), "descending order")
    val dup = Seq((7L, "a b"), (6L, "a b")).toDF("doc_id", "text")
    val tied = TextAnalysis.bm25TopDocs(dup, Seq("a", "b"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(6L, 7L), "equal scores order by doc_id")
  }
}
