package graft

import org.apache.spark.sql.functions._

import graft.operators.Governance

/** k-anonymity and erasure propagation on hand-built tables: class
  * formation (incl. NULL QIs), the summary scalars, and the
  * report-vs-apply consistency contract. */
class GovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private def people = Seq(
    ("a", 30, "x"), ("a", 30, "x"), ("a", 30, "x"),   // class of 3
    ("b", 40, "y"), ("b", 40, "y"),                   // class of 2
    ("c", 50, "z")).toDF("zip", "age", "sex")         // class of 1

  test("kAnonymity: class sizes and the sub-k flag") {
    val got = Governance.kAnonymity(people, Seq("zip", "age"), k = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("a" -> ((3L, false)), "b" -> ((2L, true)),
      "c" -> ((1L, true))))
  }

  test("kAnonymity: NULL quasi-id values form one class, not many") {
    val df = Seq((None: Option[String], 1), (None, 1), (Some("q"), 1))
      .toDF("zip", "age")
    val n = Governance.kAnonymity(df, Seq("zip"), k = 2L)
      .filter(col("zip").isNull).collect()
    assert(n.length == 1 && n.head.getLong(1) == 2L)
  }

  test("kAnonymitySummary: achieved k is the smallest class") {
    val got = Governance.kAnonymitySummary(people, Seq("zip", "age"), k = 3L)
      .collect().head
    assert(got.getLong(0) == 1L)   // achieved_k
    assert(got.getLong(1) == 3L)   // n_classes
    assert(got.getLong(2) == 2L)   // classes at risk
    assert(got.getLong(3) == 3L)   // rows at risk (2 + 1)
  }

  test("erasureReport counts match erase's surviving rows per table") {
    val facts = Seq((1L, "a"), (2L, "b"), (3L, "c"), (2L, "d"))
      .toDF("uid", "payload")
    val reqs = Seq(2L, 9L).toDF("subject")
    val rep = Governance.erasureReport(reqs, "subject",
      Seq(("facts", facts, "uid"))).collect().head
    assert(rep.getLong(1) == 4L && rep.getLong(2) == 2L && rep.getLong(3) == 2L)
    val survivors = Governance.erase(facts, "uid", reqs, "subject")
    assert(survivors.count() == rep.getLong(3))
    assert(survivors.filter(col("uid") === 2L).count() == 0L)
  }

  test("lDiversity: a k-large but homogeneous class is flagged; NULL sensitive ignored") {
    val rows = Seq(
      // class (94110, 30): 3 rows but ONE sensitive value — k-safe, l-unsafe
      ("94110", 30, Some("flu")), ("94110", 30, Some("flu")), ("94110", 30, Some("flu")),
      // class (94110, 40): 2 distinct sensitive values + a NULL (ignored)
      ("94110", 40, Some("flu")), ("94110", 40, Some("cold")), ("94110", 40, None)
    ).toDF("zip", "age", "dx")
    val got = Governance.lDiversity(rows, Seq("zip", "age"), "dx", l = 2L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("94110", 30)) == ((3L, 1L, false)),
      "homogeneous class must fail l-diversity even at k=3")
    assert(got(("94110", 40)) == ((3L, 2L, true)))
    intercept[IllegalArgumentException] {
      Governance.lDiversity(rows, Seq("zip", "dx"), "dx", l = 2L)
    }
  }

  test("tCloseness: ordered EMD vs the global distribution, hand-computed") {
    // global over bins {0, 1}: 6/6, N = 12, m = 2. Classes A (all 0)
    // and B (all 1) sit EMD 0.5 from global; class C (2/2) matches it.
    val rows = (Seq.fill(4)(("A", Some(0L))) ++ Seq.fill(4)(("B", Some(1L)))
      ++ Seq(("C", Some(0L)), ("C", Some(0L)), ("C", Some(1L)), ("C", Some(1L)),
        ("C", None))) // NULL sensitive: excluded from BOTH distributions
      .toDF("zip", "v")
    val got = Governance.tCloseness(rows, Seq("zip"), "v", tMicro = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // A: |12·4 − 4·6| / (4·12·1) = 24/48 = 0.5; B symmetric; C exact 0
    assert(got("A") == ((4L, 500000L, false)), got.toString)
    assert(got("B") == ((4L, 500000L, false)), got.toString)
    assert(got("C") == ((4L, 0L, true)), got.toString)
    // a NULL quasi-id forms its own class and its cells still join
    // (null-safe): global 2/2, the null class holds both 0s -> t = 0.5
    val nq = Seq((None: Option[String], 0L), (None, 0L),
      (Some("a"), 1L), (Some("a"), 1L)).toDF("zip", "v")
    val gotNq = Governance.tCloseness(nq, Seq("zip"), "v", 200000L)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotNq(None) == ((2L, 500000L)), gotNq.toString)
    assert(gotNq(Some("a")) == ((2L, 500000L)), gotNq.toString)
    // a single global bin (m = 1): every class trivially matches
    val one = Seq(("x", 7L), ("y", 7L)).toDF("zip", "v")
    assert(Governance.tCloseness(one, Seq("zip"), "v", 0L)
      .collect().forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
    intercept[IllegalArgumentException] {
      Governance.tCloseness(rows, Seq("v"), "v", 0L)
    }
  }

  test("erasure: NULL subject keys are never erased") {
    val facts = Seq(Some(1L), None, None).toDF("uid")
    val reqs = Seq(1L).toDF("subject")
    val rep = Governance.erasureReport(reqs, "subject",
      Seq(("facts", facts, "uid"))).collect().head
    assert(rep.getLong(2) == 1L && rep.getLong(3) == 2L)
    assert(Governance.erase(facts, "uid", reqs, "subject").count() == 2L)
  }
}
