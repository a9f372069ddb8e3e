package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Merged-BPE tokenizer vs an obviously-correct single-threaded
  * reference (à la Bm25Spec): the reference applies each rank by
  * literal space-joined string replace iterated to fixpoint — the
  * exact process the DuckDB oracle CTE runs — and must agree with the
  * native array-pass expression everywhere. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val unitRe = TextFunctions.BpePattern.r

  /** Reference: per unit, space-join the chars; for each rank in order,
    * replace ' a b ' -> ' ab ' (all non-overlapping, left to right)
    * until the pattern no longer occurs; count surviving symbols. */
  private def refCount(text: String,
      merges: Seq[(String, String)] = TextFunctions.DefaultBpeMerges): Long =
    unitRe.findAllIn(text).map { u =>
      var seq = u.toCharArray.mkString(" ", " ", " ")
      merges.foreach { case (a, b) =>
        val pat = s" $a $b "
        val rep = s" $a$b "
        while (seq.contains(pat)) seq = seq.replace(pat, rep)
      }
      seq.trim.split(" ").length.toLong
    }.sum

  private def sparkCounts(texts: Seq[String]): Seq[Long] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    df.select(col("id"), TextFunctions.bpeMergedTokenCount(col("text")).as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
  }

  test("merged count matches the replace-based reference on hand cases") {
    val texts = Seq(
      "the customer filter merges vectors in order",   // many learned merges fire
      "",                                              // empty -> 0
      "   ",                                           // whitespace only -> 0
      "a",                                             // single char unit
      "123 456",                                       // digits are single-symbol units
      "batch batch batch",                             // repeated merged word
      "scan, merge; join!",                            // punctuation units survive as 1 each
      "vector vectorvector",                           // merges inside long runs
      "naïve café ü",                                  // non-ASCII glyphs are units
      "mixed CASE Words keep Case sensitivity")        // merges are lowercase-only
    val got = sparkCounts(texts)
    val want = texts.map(refCount(_))
    assert(got == want, s"spark=$got ref=$want")
    assert(got(1) == 0L && got(2) == 0L)
    // sanity: merging strictly reduces the pre-tokenizer char count
    // for text where rules fire ("vector" is a single learned token)
    assert(refCount("vector") == 1L)
    assert(refCount("order") == 1L)
    assert(refCount("customer") == 1L)
  }

  test("merged count matches the reference across the corpus sample") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextFunctions.bpeMergedTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refCount(text), s"doc $id")
    }
  }

  test("merged count is bounded by the pre-tokenizer unit count and char mass") {
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = df.select(
        TextFunctions.bpeMergedTokenCount(col("text")).as("m"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("pre"),
        length(col("text")).cast("long").as("chars"))
      .filter(col("m") > col("chars") || (col("pre") > 0 && col("m") < col("pre") / lit(20)) ||
        (col("pre") > 0 && col("m") === 0))
      .count()
    assert(bad == 0L, "merged count must stay within sane bounds of the unit count")
  }

  test("encode emits the reference sequence; count == sequence length") {
    // reference sequence: the same iterated-replace fixpoint, kept as
    // the space-joined string instead of its length
    def refEncode(text: String): String =
      unitRe.findAllIn(text).map { u =>
        var seq = u.toCharArray.mkString(" ", " ", " ")
        TextFunctions.DefaultBpeMerges.foreach { case (a, b) =>
          val pat = s" $a $b "
          val rep = s" $a$b "
          while (seq.contains(pat)) seq = seq.replace(pat, rep)
        }
        seq.trim
      }.mkString(" ")
    val texts = Seq(
      "the customer filter merges vectors in order",
      "", "   ", "a", "123 456",
      "batch batch batch", "scan, merge; join!",
      "vector vectorvector", "naïve café ü",
      "mixed CASE Words keep Case sensitivity")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.bpeEncode(col("text")).as("enc"),
        TextFunctions.bpeMergedTokenCount(col("text")).as("n"))
      .orderBy("id").collect()
    got.zip(texts).foreach { case (r, t) =>
      val enc = r.getString(1)
      assert(enc == refEncode(t), s"encode mismatch on '$t'")
      val lenFromEnc = if (enc.isEmpty) 0L else enc.split(" ").length.toLong
      assert(r.getLong(2) == lenFromEnc,
        s"count != encode length on '$t': ${r.getLong(2)} vs $lenFromEnc")
    }
  }

  test("self-pair merge rules are rejected (confluence guard)") {
    intercept[IllegalArgumentException] {
      val df = Seq((1L, "aaaa")).toDF("id", "text")
      df.select(TextFunctions.bpeMergedTokenCount(col("text"),
        Seq(("a", "a")))).collect()
    }
  }
}
