package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Fellegi–Sunter calibration + scoring against hand-counted
  * combinatorics on a tiny blocked record set. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  // Block "x": entities A (3 records) and B (2); block "y": entity C
  // (2 records) + a singleton D. Field `phone` tracks the entity
  // almost perfectly (one dirty A record); field `noise` is
  // uninformative (constant — every pair agrees, match or not).
  private lazy val recs = Seq(
    (1L, "x", "A", "p1", "k"),
    (2L, "x", "A", "p1", "k"),
    (3L, "x", "A", "p9", "k"), // dirty phone on an A record
    (4L, "x", "B", "p2", "k"),
    (5L, "x", "B", "p2", "k"),
    (6L, "y", "C", "p3", "k"),
    (7L, "y", "C", "p3", "k"),
    (8L, "y", "D", "p4", "k"))
    .toDF("id", "blk", "ent", "phone", "noise")

  private val fields = Seq(
    "phone_eq" -> col("phone"),
    "noise_eq" -> col("noise"))

  // Hand counts. Block x: C(5,2)=10 pairs; block y: C(3,2)=3 → 13.
  // Matches: C(3,2)+C(2,2... C(2,2)? no — C(3,2)=3 (A) + C(2,2)=1 (B)
  // + C(2,2)=1 (C) = 5; nonmatch = 8.
  // phone agree: p1 C(2,2)=1, p2 1, p3 1 → 3, all of them matches.
  // noise agree: all 13 (constant within each block), 5 match + 8 not.
  private val nMatch = 5L
  private val nNon = 8L

  private def w(aM: Long, aU: Long): (Long, Long) = {
    val m = (aM + 1).toDouble / (nMatch + 2)
    val u = (aU + 1).toDouble / (nNon + 2)
    (math.floor(math.log(m / u) * 1e6).toLong,
      math.floor(math.log((1 - m) / (1 - u)) * 1e6).toLong)
  }

  test("FS calibration matches hand-computed combinatorial counts") {
    val got = Linkage.fellegiSunterWeights(
      recs, col("blk"), col("ent"), fields).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("noise_eq", "phone_eq"))
    val byField = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    val (pa, pd) = w(3L, 0L)
    assert(byField("phone_eq") == ((nMatch, nNon, 3L, 0L, pa, pd)))
    val (na, nd) = w(5L, 8L)
    assert(byField("noise_eq") == ((nMatch, nNon, 5L, 8L, na, nd)))
    // the informative field earns a large positive agree weight, the
    // constant field stays near zero — FS downweights non-evidence
    assert(pa > 500000L, s"phone agree weight should be strongly positive: $pa")
    assert(math.abs(na) < 500000L, s"noise agree weight should be ~0: $na")
    assert(pd < 0L, "phone disagreement is evidence AGAINST a match")
  }

  test("FS scoring sums the calibrated weights and separates matches") {
    val weights = Linkage.fellegiSunterWeights(
      recs, col("blk"), col("ent"), fields)
    val scored = Linkage.scorePairs(recs, col("id"), col("blk"),
      col("ent"), fields, weights).collect()
    assert(scored.length == 13, "13 in-block pairs")
    assert(scored.forall(r => r.getLong(0) < r.getLong(1)), "a_id < b_id")
    val (pa, pd) = w(3L, 0L)
    val (na, _) = w(5L, 8L)
    val byPair = scored.map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byPair((1L, 2L)) == ((1L, pa + na)), "clean match: both agree")
    assert(byPair((1L, 3L)) == ((1L, pd + na)), "dirty match: phone disagrees")
    assert(byPair((1L, 4L)) == ((0L, pd + na)), "cross-entity pair")
    val matches = scored.filter(_.getLong(2) == 1L).map(_.getLong(3))
    val nons = scored.filter(_.getLong(2) == 0L).map(_.getLong(3))
    assert(matches.sum.toDouble / matches.length >
      nons.sum.toDouble / nons.length,
      "mean match score must exceed mean non-match score")
  }

  test("FS scoring never pairs across blocks and respects maxBlock") {
    val weights = Linkage.fellegiSunterWeights(
      recs, col("blk"), col("ent"), fields)
    val scored = Linkage.scorePairs(recs, col("id"), col("blk"),
      col("ent"), fields, weights)
    val crossBlock = scored.filter(
      (col("a_id") <= 5 && col("b_id") >= 6) ||
        (col("a_id") >= 6 && col("b_id") <= 5)).count()
    assert(crossBlock == 0L, "pairs never cross a block boundary")
    // maxBlock=3 drops block x (5 records) entirely, keeps block y
    val trimmed = Linkage.scorePairs(recs, col("id"), col("blk"),
      col("ent"), fields, weights, maxBlock = 3).collect()
    assert(trimmed.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((6L, 7L), (6L, 8L), (7L, 8L)))
  }

  test("pair-free separation histogram equals the scored-pair histogram") {
    val weights = Linkage.fellegiSunterWeights(
      recs, col("blk"), col("ent"), fields)
    // truth: histogram the materialized pair scores
    val expected = Linkage.scorePairs(recs, col("id"), col("blk"),
        col("ent"), fields, weights)
      .collect()
      .groupBy(r => (r.getLong(2),
        math.floor(r.getLong(3).toDouble / 1e6).toLong))
      .view.mapValues(_.length.toLong).toMap
    val got = Linkage.scoreSeparation(recs, col("blk"), col("ent"),
        fields, weights)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"Möbius-inverted pattern counts must equal pair enumeration:\n" +
        s"got $got\nexpected $expected")
    // and the maxBlock trim applies identically on the pair-free path
    val trimmed = Linkage.scoreSeparation(recs, col("blk"), col("ent"),
      fields, weights, maxBlock = 3).collect()
    assert(trimmed.map(_.getLong(2)).sum == 3L,
      "only block y's 3 pairs survive maxBlock=3")
  }

  // 120 records, 4 blocks of 30 with NESTED latent groups of 6:
  // `code` names the group exactly, `tag` is a dirty copy (every 6th
  // record corrupted to a unique value), `junk` is an independent
  // parity bit. Three binary indicators make the latent-class model
  // identifiable (k=2 is not: 4 patterns < 5 parameters). No truth
  // column is ever given to EM.
  private def emRow(i: Int): (Long, String, String, String, String) =
    (i.toLong, (i / 30).toString, s"g${i / 6}",
      if (i % 6 != 5) s"g${i / 6}" else s"x$i", (i % 2).toString)
  private lazy val emRecs = (0 until 120).map(emRow)
    .toDF("id", "blk", "code", "tag", "junk")
  private val emFields = Seq("code_eq" -> col("code"),
    "tag_eq" -> col("tag"), "junk_eq" -> col("junk"))

  test("agreement pattern counts equal brute-force pair enumeration") {
    val got = Linkage.agreementPatternCounts(
      emRecs, col("blk"), emFields).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = (0 until 120).map(emRow)
    val expected = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (i <- rows.indices; j <- rows.indices if i < j
         if rows(i)._2 == rows(j)._2) {
      val pm = (if (rows(i)._3 == rows(j)._3) 1L else 0L) |
        (if (rows(i)._4 == rows(j)._4) 2L else 0L) |
        (if (rows(i)._5 == rows(j)._5) 4L else 0L)
      expected(pm) += 1L
    }
    assert(got == expected.toMap, s"got $got expected $expected")
    assert(got.values.sum == 4L * 30 * 29 / 2, "total in-block pairs")
  }

  test("unsupervised EM recovers the informative fields without any truth label") {
    val w = Linkage.fellegiSunterEmWeights(
      emRecs, col("blk"), emFields).collect()
    assert(w.map(_.getString(0)).toSeq ==
      Seq("code_eq", "junk_eq", "tag_eq"))
    val byField = w.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (cm, cu, cwa, _) = byField("code_eq")
    val (_, _, twa, _) = byField("tag_eq")
    val (_, _, jwa, jwd) = byField("junk_eq")
    assert(cm > 900000L && cu < 100000L,
      s"EM must anchor the match class to code agreement: m=$cm u=$cu")
    assert(cwa > 2000000L, s"code agreement is strong evidence: $cwa")
    assert(twa > 2000000L, s"the dirty copy still carries evidence: $twa")
    assert(math.abs(jwa) < 500000L && math.abs(jwd) < 500000L,
      s"the independent parity field carries ~no evidence: $jwa/$jwd")
  }

  test("EM is pure, order-free, and honest about empty input") {
    val pats = Linkage.agreementPatternCounts(
      emRecs, col("blk"), emFields).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = Linkage.emCalibrate(pats, 3, iters = 15)
    assert(Linkage.emCalibrate(pats, 3, iters = 15) == a, "deterministic")
    assert(Linkage.emCalibrate(pats.reverse, 3, iters = 15) == a,
      "pattern order cannot matter (integer sums are order-free)")
    intercept[IllegalArgumentException] {
      Linkage.emCalibrate(Seq.empty, 3, iters = 5)
    } // no pattern statistic at all -> honest failure
  }

  test("positive-evidence links reach exactly the components of the scored-pair graph") {
    import spark.implicits._
    // crafted monotone weights with MULTI-field minimal patterns:
    // {code} alone is positive; tag needs junk's help ({tag,junk}) —
    // exercises both a singleton and a composite generator
    val w = Seq(
      ("code_eq", 0L, 0L, 5000000L, -1000000L),
      ("tag_eq", 0L, 0L, 2000000L, -2000000L),
      ("junk_eq", 0L, 0L, 100000L, -100000L))
      .toDF("field", "m_micro", "u_micro",
        "w_agree_micro", "w_disagree_micro")
    val scored = Linkage.scorePairs(emRecs, col("id"), col("blk"),
        col("id"), emFields, w)
      .filter(col("score_micro") > 0L).select("a_id", "b_id")
    val ids = emRecs.select(col("id"))
    def comps(edges: org.apache.spark.sql.DataFrame) =
      graft.operators.Components.connectedComponents(ids, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = comps(scored)
    val links = Linkage.positiveEvidenceLinks(
      emRecs, col("id"), col("blk"), emFields, w)
    val viaStars = comps(links)
    assert(viaStars == viaPairs,
      "star-generated links must close to the same components")
    assert(links.count() < scored.count(),
      "the star generator must be strictly sparser than the pair graph")
  }

  test("positive-evidence links refuse non-monotone weights and handle no-positive-pattern") {
    import spark.implicits._
    val w = Seq(("code_eq", 5L, -1L, -100000L, 100000L),
        ("tag_eq", 5L, 5L, -100000L, 100000L),
        ("junk_eq", 5L, 5L, -100000L, 100000L))
      .toDF("field", "m_micro", "u_micro",
        "w_agree_micro", "w_disagree_micro")
    intercept[IllegalArgumentException] {
      Linkage.positiveEvidenceLinks(
        emRecs, col("id"), col("blk"), emFields, w).collect()
    }
    // all-negative weights: no positive pattern, zero links
    val neg = Seq(("code_eq", 1L, 1L, -5L, -9L),
        ("tag_eq", 1L, 1L, -5L, -9L), ("junk_eq", 1L, 1L, -5L, -9L))
      .toDF("field", "m_micro", "u_micro",
        "w_agree_micro", "w_disagree_micro")
    assert(Linkage.positiveEvidenceLinks(
      emRecs, col("id"), col("blk"), emFields, neg).count() == 0L)
  }

  test("field names are confined to safe identifiers (they travel into generated SQL)") {
    // a backtick or quote in a field name would break the stack(...)
    // SQL or silently alter the generated expression — refused up front
    Seq("bad`tick", "bad'quote", "bad name", "bad,comma").foreach { n =>
      val e = intercept[IllegalArgumentException] {
        Linkage.fellegiSunterWeights(emRecs, col("blk"), col("id"),
          Seq(n -> col("code")))
      }
      assert(e.getMessage.contains("[A-Za-z0-9_]+"), e.getMessage)
      intercept[IllegalArgumentException] {
        Linkage.agreementPatternCounts(emRecs, col("blk"),
          Seq(n -> col("code")))
      }
    }
  }

  test("EM refuses an unidentifiable model (fewer than 3 comparison fields)") {
    // 2 binary indicators give 4 observable patterns but 5 free
    // parameters — EM latches onto noise; the operator refuses rather
    // than calibrating garbage
    val e = intercept[IllegalArgumentException] {
      Linkage.fellegiSunterEmWeights(emRecs, col("blk"),
        emFields.take(2))
    }
    assert(e.getMessage.contains("identifiable"), e.getMessage)
    // the supervised path has no such floor (truth label provided)
    assert(Linkage.fellegiSunterWeights(emRecs, col("blk"), col("code"),
      emFields.take(2)).count() == 2L)
  }

  test("value-specific weights: a rare value outscores a common one") {
    // block z: rare name "zyl" only inside entity E; common name
    // "smith" shared across F (a real match pair) and singletons G, H.
    // np = C(6,2) = 15, nm = C(2,2)+C(2,2) = 2; per value: zyl na=1
    // nam=1, smith na=C(4,2)=6 nam=1 — same match evidence, 5 extra
    // NON-match agreeing pairs for smith, so w(zyl) − w(smith) = ln 6.
    val vrecs = Seq(
      (1L, "z", "E", "zyl"), (2L, "z", "E", "zyl"),
      (3L, "z", "F", "smith"), (4L, "z", "F", "smith"),
      (5L, "z", "G", "smith"), (6L, "z", "H", "smith"))
      .toDF("id", "blk", "ent", "name")
    val got = Linkage.fellegiSunterValueWeights(vrecs, col("blk"),
      col("ent"), Seq("name_eq" -> col("name"))).collect()
    val byVal = got.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byVal.keySet == Set("zyl", "smith"), byVal.toString)
    def wv(nam: Long, na: Long): Long =
      math.floor(math.log((nam + 1).toDouble * (15L - 2L + 2L).toDouble
        / ((2L + 2L).toDouble * (na - nam + 1).toDouble)) * 1e6).toLong
    assert(byVal("zyl") == ((1L, 0L, wv(1L, 1L))), byVal("zyl").toString)
    assert(byVal("smith") == ((1L, 5L, wv(1L, 6L))), byVal("smith").toString)
    assert(byVal("zyl")._3 > byVal("smith")._3,
      "rare-value agreement must carry more evidence than common-value")
    // values with no in-block agreeing pair produce no row (nothing to
    // weight): a singleton-valued record set yields an empty table
    val singles = Seq((1L, "z", "E", "a"), (2L, "z", "F", "b"))
      .toDF("id", "blk", "ent", "name")
    assert(Linkage.fellegiSunterValueWeights(singles, col("blk"),
      col("ent"), Seq("name_eq" -> col("name"))).count() == 0L)
  }

  test("fused calibration equals the two separate calibrations bit-for-bit") {
    // same machinery, one pass: both outputs must be IDENTICAL to the
    // standalone functions on the same records (integer-exact fold)
    val (fw, vw) = Linkage.fellegiSunterBothWeights(recs, col("blk"),
      col("ent"), fields)
    val fwRef = Linkage.fellegiSunterWeights(recs, col("blk"),
      col("ent"), fields)
    val vwRef = Linkage.fellegiSunterValueWeights(recs, col("blk"),
      col("ent"), fields)
    assert(fw.columns.toSeq == fwRef.columns.toSeq)
    assert(vw.columns.toSeq == vwRef.columns.toSeq)
    assert(fw.collect().toSeq == fwRef.collect().toSeq)
    assert(vw.collect().toSeq == vwRef.collect().toSeq)
  }

  test("calibration handles empty input and a single block") {
    val empty = Seq.empty[(Long, String, String, String, String)]
      .toDF("id", "blk", "ent", "phone", "noise")
    val w0 = Linkage.fellegiSunterWeights(
      empty, col("blk"), col("ent"), fields).collect()
    assert(w0.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      "zero counts, no division by zero (Laplace smoothing)")
  }
}
