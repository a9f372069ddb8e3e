package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions._

/** Property tests (SURVEY.md §5.2) for the text/sketch library — the
  * native expressions are checked against independent Scala models over
  * scalacheck-generated corpora (deterministic seed; no scalatestplus in
  * the offline cache, so sampling is driven directly). */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  /** Deterministic sample list from a Gen. */
  private def samples[A](gen: Gen[A], n: Int): List[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => gen.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toList
  }

  /** Scala model of md5Hash60 (first 15 hex chars of md5("seed:"+s)). */
  private def modelMd5H60(seed: Int, s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((s"$seed:" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("native MinHashSigExpr == per-seed min of md5Hash60 model") {
    val texts = samples(text, 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"), shinglesOfLowered(col("lt"), 3).as("sh"))
      .select(col("doc_id"), col("sh"), minHashSignature(col("sh"), 4).as("sig"))
      .orderBy("doc_id").collect()
    assert(got.length == texts.length)
    got.foreach { r =>
      val sh = r.getSeq[String](1)
      val sig = r.getSeq[Any](2)
      (0 until 4).foreach { seed =>
        val want = if (sh.isEmpty) null else Long.box(sh.map(modelMd5H60(seed, _)).min)
        assert(sig(seed) == want, s"doc ${r.getLong(0)} seed $seed")
      }
    }
  }

  test("simHash60 == bitwise-majority model") {
    val texts = samples(text, 40)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), simHash60(col("toks")).as("s"))
      .orderBy("doc_id").collect()
    got.zip(texts).foreach { case (r, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val hashes = toks.map(modelMd5H60(0, _))
      val want = (0 until 60).foldLeft(0L) { (acc, i) =>
        val sum = hashes.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (sum > 0) acc | (1L << i) else acc
      }
      assert(r.getLong(1) == want, s"text '$t'")
    }
  }

  test("sortedIntersectCount == Set intersection size") {
    val pairGen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val pairs = samples(pairGen, 60)
    val got = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
      .select(col("id"), sortedIntersectCount(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getLong(1) == a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("hashedJaccard == exact set jaccard (collision-free at this size)") {
    val pairGen = for {
      a <- Gen.listOf(word)
      b <- Gen.listOf(word)
    } yield (a.distinct, b.distinct)
    val pairs = samples(pairGen, 60)
    val got = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
      .select(col("id"), hashedJaccard(hashedSortedSet(col("a")),
        hashedSortedSet(col("b"))).as("j"))
      .orderBy("id").collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val uni = a.toSet.union(b.toSet).size.toDouble
      val want = if (uni == 0) 0.0 else inter / uni
      assert(math.abs(r.getDouble(1) - want) < 1e-12, s"$a vs $b")
    }
  }

  test("charShingles: distinct length-k substrings in first-seen order") {
    val texts = samples(text, 40)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), charShingles(col("text"), 5).as("sh"))
      .orderBy("id").collect()
    got.zip(texts).foreach { case (r, t) =>
      val want = t.toLowerCase.sliding(5).filter(_.length == 5).toSeq.distinct
      assert(r.getSeq[String](1) == want, s"'$t'")
    }
  }

  test("hashedShingles: set size and pairwise jaccard match the string shingle path") {
    // include multibyte text — the byte walk must respect char boundaries
    val texts = samples(text, 30) ++ Seq("héllo wörld héllo", "日本語のテキストです日本語",
      "mix étude 漢字 mix étude", "", "abcd", "ababababab")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), lower(col("text")).as("lt"))
      .select(col("id"),
        hashedShingles(col("lt"), 5).as("hs"),
        charShingles(col("lt"), 5).as("ss"))
    val rows = df.orderBy("id").collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](1).size == r.getSeq[String](2).distinct.size, s"'$t'")
      assert(r.getSeq[Long](1) == r.getSeq[Long](1).sorted, s"'$t' not sorted")
    }
    // random unicode mixing 1-4 byte chars (incl. surrogate-pair emoji):
    // the byte walk must agree with substring semantics everywhere
    val uniChar = Gen.oneOf(
      Gen.alphaLowerChar.map(_.toString), Gen.const("é"), Gen.const("語"),
      Gen.const("😀"), Gen.const(" "))  // 😀 = 4-byte UTF-8
    val uniText = Gen.listOfN(40, uniChar).map(_.mkString)
    val uniTexts = samples(uniText, 25)
    val uniRows = uniTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), lower(col("text")).as("lt"))
      .select(col("id"),
        hashedShingles(col("lt"), 5).as("hs"),
        charShingles(col("lt"), 5).as("ss"))
      .orderBy("id").collect()
    uniRows.zip(uniTexts).foreach { case (r, t) =>
      assert(r.getSeq[Long](1).size == r.getSeq[String](2).distinct.size,
        s"unicode '$t'")
    }

    // pairwise jaccard equal between the hashed-long and string paths
    val pairs = texts.indices.combinations(2).take(60).map { case Seq(a, b) => (a, b) }.toSeq
    val byId = rows.map(r => r.getLong(0) -> (r.getSeq[Long](1).toSet, r.getSeq[String](2).toSet)).toMap
    pairs.foreach { case (a, b) =>
      val (ha, sa) = byId(a.toLong); val (hb, sb) = byId(b.toLong)
      val hj = if (ha.isEmpty && hb.isEmpty) 0.0
        else ha.intersect(hb).size.toDouble / ha.union(hb).size
      val sj = if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(hj - sj) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("string-free LSH path: signatures equal the string-shingle xx family on ASCII") {
    val texts = samples(text, 30).filter(_.nonEmpty)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), lower(col("text")).as("lt"))
      .select(col("id"),
        longMinHashSignature(hashedShingles(col("lt"), 5), 16).as("a"),
        xxMinHashSignature(shinglesOfLowered(col("lt"), 5), 16).as("b"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2)))
  }

  test("longMinHashSignature: sensitive to set content, null-filled on empty") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)), (3L, Seq(4L, 5L)),
      (4L, Seq.empty[Long]))
      .toDF("id", "s")
      .select(col("id"), longMinHashSignature(col("s"), 8).as("sig"))
      .orderBy("id").collect()
    assert(df(0).getSeq[Any](1) == df(1).getSeq[Any](1))       // deterministic
    assert(df(0).getSeq[Any](1) != df(2).getSeq[Any](1))       // content-sensitive
    assert(df(3).getSeq[Any](1).forall(_ == null))             // empty → nulls
  }

  test("wordNgrams: distinct joined n-grams in first-seen order") {
    val texts = samples(text, 40)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), wordNgrams(col("text"), 2).as("ng"))
      .orderBy("id").collect()
    got.zip(texts).foreach { case (r, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want =
        if (t.trim.isEmpty || toks.size < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
      assert(r.getSeq[String](1) == want, s"'$t'")
    }
  }

  test("repetition: hand-computed line and bigram counts") {
    val docs = Seq(
      // 4 non-empty lines, "spam spam" line repeated twice → 1 dup;
      // tokens: spam spam buy now spam spam end → bigrams
      // [spam spam, spam buy, buy now, now spam, spam spam, spam end]:
      // 6 bigrams, top "spam spam" ×2
      (1L, "spam spam\nbuy now\n\nspam spam\n  \nend"),
      (2L, "one line only"), // 1 line, 0 dups, 2 bigrams all unique
      (3L, ""),              // empty: all zeros
      (4L, "x")              // 1 line, single token → 0 bigrams
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.repetition(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    //                 (doc, n_lines, n_dup_lines, n_bigrams, top_bigram_n)
    assert(got == Seq((1L, 4L, 1L, 6L, 2L),
                      (2L, 1L, 0L, 2L, 1L),
                      (3L, 0L, 0L, 0L, 0L),
                      (4L, 1L, 0L, 0L, 0L)))
  }

  test("piiScrub: emails and long numbers redacted, counts match") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.com or call 0123456789 now"),
      (2L, "short 12345678 stays; account 123456789012 goes"),
      (3L, "no pii here"),
      // digits inside the email are consumed by the email rule and
      // must NOT count as a long number (count == <NUM> placeholders)
      (4L, "id 123456789@bank.example now")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.piiScrub(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 1L, 1L, "mail <EMAIL> or call <NUM> now"),
      (2L, 0L, 1L, "short 12345678 stays; account <NUM> goes"),
      (3L, 0L, 0L, "no pii here"),
      (4L, 1L, 0L, "id <EMAIL> now")))
  }

  test("normalizeText: case, accents, control chars, whitespace runs") {
    val cases = Seq(
      "  Hello   WORLD  " -> "hello world",
      "Él Ñiño çà" -> "el nino ca",
      "a\t\tb\r\nc" -> "a b c",
      "x\u0000y\u001fz" -> "x y z",
      "" -> "",
      "   \t  " -> "")
    cases.foreach { case (in, want) =>
      val got = Seq(Tuple1(in)).toDF("t")
        .select(normalizeText(col("t"))).collect()(0).getString(0)
      assert(got == want, s"normalizeText(${in.replace("\u0000", "<NUL>")})")
    }
  }

  test("charChunks: offsets, overlap, tail chunk, short doc") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.Chunking.charChunks(docs, "text", size = 4, stride = 3)
      .orderBy("doc_id", "off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 0L, "abcd"), (1L, 3L, "defg"), (1L, 6L, "ghij"), (1L, 9L, "j"),
      (2L, 0L, "xy"),
      (3L, 0L, "")))
    intercept[IllegalArgumentException](
      graft.operators.Chunking.charChunks(docs, "text", size = 0, stride = 3))
  }

  test("postings: sorted lists, df bound, per-doc dedup before the count") {
    val docs = Seq(
      (3L, "b a b b"),   // 'b' repeats within the doc — df counts docs, not hits
      (1L, "a c"),
      (2L, "a b")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.postings(docs, minDf = 2L)
      .orderBy("tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(("a", 3L, "1,2,3"), ("b", 2L, "2,3")))
  }

  test("CDC chunks: lossless reassembly, length bounds, unicode-safe") {
    val uniChar = Gen.oneOf(
      Gen.alphaLowerChar.map(_.toString), Gen.const(" "), Gen.const("é"),
      Gen.const("語"), Gen.const("😀"))
    val texts = samples(Gen.listOfN(500, uniChar).map(_.mkString), 20) ++
      Seq("", "x", "a" * 1000)
    val (maskBits, minLen, maxLen) = (5, 8, 100)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .transform(df => graft.operators.Chunking
        .cdcChunks(df, "text", maskBits, minLen, maxLen))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    texts.zipWithIndex.foreach { case (t, i) =>
      val chunks = got(i.toLong)
      assert(chunks.mkString == t, s"doc $i must reassemble losslessly")
      // every chunk except the tail respects [minLen, maxLen]; the
      // surrogate-pair deferral can stretch a cut by one unit
      chunks.dropRight(1).foreach { c =>
        assert(c.length >= minLen && c.length <= maxLen + 1, s"doc $i: ${c.length}")
      }
    }
  }

  test("CDC chunks: an edit only disturbs chunks near it (fixed-stride cannot)") {
    val base = samples(Gen.listOfN(4000, Gen.alphaNumChar), 1).head.mkString
    val editPos = 2000
    val edited = base.updated(editPos, if (base(editPos) == 'q') 'z' else 'q')
    def chunksOf(t: String): Seq[(Int, String)] = {
      // offsets derived from cumulative lengths
      val cs = Seq(Tuple1(t)).toDF("text")
        .transform(df => graft.operators.Chunking.cdcChunks(df, "text", 5, 8, 100))
        .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
      cs.scanLeft(0)(_ + _.length).zip(cs)
    }
    val a = chunksOf(base).toSet
    val b = chunksOf(edited).toSet
    // all chunks fully before the edit are untouched; chunks starting
    // beyond the edit's maximum influence (maxLen + the gear window)
    // realign to IDENTICAL (offset, content) pairs — the CDC property
    val before = a.filter { case (off, c) => off + c.length <= editPos }
    assert(before.subsetOf(b), "chunks before the edit must be identical")
    val far = a.filter { case (off, _) => off > editPos + 100 + 64 }
    assert(far.nonEmpty && far.subsetOf(b),
      "chunks past the edit window must realign identically")
    // and the edit did change SOMETHING
    assert(a != b)
  }

  test("L5f sentence chunks: split, windowing, overlap, tail clamp") {
    import graft.operators.Chunking
    val docs = Seq(
      (1L, "A b. C d! E f? G h. Tail no end"),
      (2L, ""),                      // no sentences -> no chunks
      (3L, "just one sentence"),     // unterminated tail alone
      (4L, "Wow!!! Right?")          // terminator runs stay attached
    ).toDF("doc_id", "text")
    val got = Chunking.sentenceChunks(docs, "text", perChunk = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == Seq(
      // doc 1: 5 sentences -> window 0 = 1..4, window 1 = 4..5 (ends at
      // n, overlaps 1 sentence back — never a pure suffix repeat)
      (1L, 0L, 1L, 4L, "A b. C d! E f? G h."),
      (1L, 1L, 4L, 5L, "G h. Tail no end"),
      (3L, 0L, 1L, 1L, "just one sentence"),
      (4L, 0L, 1L, 2L, "Wow!!! Right?")))
    // guards: stride > perChunk would silently drop sentences
    intercept[IllegalArgumentException] {
      Chunking.sentenceChunks(docs, "text", perChunk = 2, stride = 3)
    }
    intercept[IllegalArgumentException] {
      Chunking.sentenceChunks(docs.withColumn("chunk", lit(1)), "text")
    }
  }

  test("L4j robust outliers: median/MAD hand model, heavy tail ignored") {
    // group A lengths: 10,10,10,12,1000 → med=10, |x-med|=0,0,0,2,990
    // → mad=0 … a zero MAD flags ANY deviation: 12 and 1000 outliers.
    // group B: 5,7,9,11,13 → med=9, devs 4,2,0,2,4 → mad=2, k=3 →
    // threshold 6: nothing flagged (the mean/stddev version would let
    // B's 13 look extreme if A's 1000 leaked into a global stat).
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L), (4L, "A", 12L),
      (5L, "A", 1000L),
      (6L, "B", 5L), (7L, "B", 7L), (8L, "B", 9L), (9L, "B", 11L),
      (10L, "B", 13L)).toDF("doc_id", "src", "n")
    val got = graft.operators.TextAnalysis.robustOutliers(docs, "src", "n")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_outlier")))).toMap
    assert(got(1L) == ((10.0, 0.0, false)))
    assert(got(4L) == ((10.0, 0.0, true)))
    assert(got(5L) == ((10.0, 0.0, true)))
    (6L to 10L).foreach(id => assert(got(id) == ((9.0, 2.0, false)), id))
  }

  test("L4j robust outliers rejects inputs with colliding med/mad/is_outlier columns") {
    val clash = Seq((1L, "A", 10L, 0.0)).toDF("doc_id", "src", "n", "mad")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.robustOutliers(clash, "src", "n")
    }
  }

  test("L4p linear quality gate: hand-computed features, margin, and boundary") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      // "the" ×2 are stopword hits; "The" is not (case-sensitive match
      // on the lowercased token stream — "the," with punct is not a hit)
      (1L, "the cat sat on the mat"),
      (2L, "A1! B2? C3."),   // punct+digit+upper heavy -> negative margin
      (3L, "")               // empty: all features 0 -> margin == bias
    ).toDF("doc_id", "text")
    val got = TextAnalysis.linearQualityGate(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    // doc 1: chars=22 stop=2 punct=0 digit=0 upper=0
    //   margin = -520000 + 2000*22 + 40000*2 = -396000 -> fail
    assert(got(0) == (1L, 22L, 2L, 0L, 0L, 0L, -396000L, false))
    // doc 2: chars=11 stop=0 punct=3 digit=3 upper=3
    //   margin = -520000 + 22000 - 90000 - 45000 - 24000 = -657000 -> fail
    assert(got(1) == (2L, 11L, 0L, 3L, 3L, 3L, -657000L, false))
    // doc 3: margin == bias
    assert(got(2) == (3L, 0L, 0L, 0L, 0L, 0L, -520000L, false))
    // a long fluent doc clears the boundary
    val long = Seq((9L, ("the quick brown fox is near the old barn and " * 10))).toDF("doc_id", "text")
    val r = TextAnalysis.linearQualityGate(long).collect().head
    assert(r.getAs[Boolean]("pass"),
      s"long fluent doc should pass, margin=${r.getAs[Long]("margin_micro")}")
  }

  test("langGuess picks the stopword-dominant language") {
    val cases = Seq(
      "the cat sat on the mat and it is that" -> "en",
      "el perro y la casa de los gatos en un dia" -> "es",
      "der hund und die katze ist von den zu ein" -> "de",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (t, want) =>
      val got = Seq(Tuple1(t)).toDF("text")
        .select(langGuess(tokens(col("text")))).collect()(0).getString(0)
      assert(got == want, t)
    }
  }
}
