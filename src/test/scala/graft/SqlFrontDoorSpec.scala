package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lower

/** SURVEY §3.2 — SQL text and the DataFrame DSL hit the same engine:
  * a session with GraftExtensions resolves the native functions from
  * plain SQL and returns values identical to the Column API. */
class SqlFrontDoorSpec extends SparkTestBase {

  private lazy val sqlSpark: SparkSession = {
    // getOrCreate would silently return the suite's shared session and
    // drop the extensions; clearing active/default forces a NEW session
    // (reusing the JVM's SparkContext) with GraftExtensions applied
    SparkTestBase.session  // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sql-front-door")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("native expressions resolve from SQL text with identical values") {
    val s = sqlSpark
    import s.implicits._
    Seq((Seq(1f, 2f, 3f), Seq(2f, 4f, 6f), Seq("a", "b"), Seq(1L, 2L, 5L), Seq(2L, 5L, 9L)))
      .toDF("va", "vb", "toks", "sa", "sb")
      .createOrReplaceTempView("t")
    val r = s.sql(
      """SELECT graft_cosine(va, vb) AS cos, graft_dot(va, vb) AS dot,
        |  graft_simhash60(toks) AS sh,
        |  graft_sorted_intersect_count(sa, sb) AS ic,
        |  graft_minhash_md5(toks, 4) AS mh,
        |  graft_rhp_bucket(va, 4, 3) AS bk
        |FROM t""".stripMargin).collect()(0)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Double]("dot") == 28.0)
    assert(r.getAs[Long]("ic") == 2L)  // {2, 5}
    // values agree with the Column API on the same session
    import graft.functions.TextFunctions
    import graft.functions.expressions.VectorExpressions
    val viaDsl = s.table("t").select(
      VectorExpressions.dotProduct($"va", $"vb"),
      TextFunctions.simHash60($"toks"),
      TextFunctions.minHashSignature($"toks", 4)).collect()(0)
    assert(viaDsl.getDouble(0) == r.getAs[Double]("dot"))
    assert(viaDsl.getLong(1) == r.getAs[Long]("sh"))
    assert(viaDsl.getSeq[Long](2) == r.getSeq[Long](4))
  }

  test("column-composition ops (zvalue, bpe count) resolve from SQL") {
    val s = sqlSpark
    import s.implicits._
    Seq((3L, 5L, "Hello, world 42!")).toDF("x", "y", "txt")
      .createOrReplaceTempView("tz")
    val r = s.sql(
      "SELECT graft_zvalue(x, y, 10) AS z, graft_bpe_count(txt) AS n FROM tz")
      .collect()(0)
    assert(r.getAs[Long]("z") == 39L) // x=11b even bits, y=101b odd bits
    // Hello , world 4 2 ! → 6 pre-token units
    assert(r.getAs[Int]("n") == 6)
    val viaDsl = s.table("tz").select(
      graft.operators.ZOrder.zValue($"x", $"y", 10),
      graft.functions.TextFunctions.bpeTokenCount($"txt")).collect()(0)
    assert(viaDsl.getLong(0) == r.getAs[Long]("z") &&
      viaDsl.getInt(1) == r.getAs[Int]("n"))
  }

  test("graft_normalize_text resolves from SQL and equals the Column API") {
    val s = sqlSpark
    import s.implicits._
    Seq(("  ÉL Ñiño \t cà và  x  ")).toDF("txt")
      .createOrReplaceTempView("tn")
    val r = s.sql("SELECT graft_normalize_text(txt) AS n FROM tn").collect()(0)
    assert(r.getAs[String]("n") == "el nino ca va x")
    val dsl = s.table("tn")
      .select(graft.functions.TextFunctions.normalizeText($"txt"))
      .collect()(0).getString(0)
    assert(dsl == r.getAs[String]("n"))
  }

  test("URL family resolves from SQL and equals the Column API") {
    val s = sqlSpark
    import s.implicits._
    Seq("https://CDN.Site.COM/Docs/5/?utm=x#frag", "not a url")
      .toDF("u").createOrReplaceTempView("tu")
    val r = s.sql(
      """SELECT graft_canonical_url(u) AS c, graft_url_host(u) AS h,
        |  graft_registered_domain(u) AS d FROM tu ORDER BY u""".stripMargin)
      .collect()
    assert(r(0).getString(0) == "cdn.site.com/Docs/5")
    assert(r(0).getString(1) == "cdn.site.com")
    assert(r(0).getString(2) == "site.com")
    assert(r(1).isNullAt(1), "malformed URL must degrade to NULL host")
    // SQL == DSL for ALL THREE functions on both rows (the hand-built
    // catalyst trees must not drift from UrlFunctions)
    import graft.functions.UrlFunctions
    val dsl = s.table("tu").orderBy($"u")
      .select(UrlFunctions.canonicalUrl($"u"), UrlFunctions.urlHost($"u"),
        UrlFunctions.registeredDomain($"u"))
      .collect().map(x => (0 to 2).map(i => Option(x.getString(i))).toSeq)
    val sqlRows = r.map(x => (0 to 2).map(i => Option(x.getString(i))).toSeq).toSeq
    assert(dsl.toSeq == sqlRows, "SQL and DSL must agree on every function")
  }

  test("string-free shingle family and byte access resolve from SQL") {
    val s = sqlSpark
    import s.implicits._
    Seq(("hello world hello", Array[Byte](0x41, 0x42, 0x43)))
      .toDF("txt", "bin").createOrReplaceTempView("t2")
    val r = s.sql(
      """SELECT graft_hashed_shingles(txt, 5) AS hs,
        |  graft_minhash_long(graft_hashed_shingles(txt, 5), 4) AS sig,
        |  graft_byte_at(bin, 2) AS b2, graft_byte_at(bin, 9) AS b9
        |FROM t2""".stripMargin).collect()(0)
    import graft.functions.TextFunctions
    val dsl = s.table("t2").select(
      TextFunctions.hashedShingles($"txt", 5),
      TextFunctions.longMinHashSignature(TextFunctions.hashedShingles($"txt", 5), 4))
      .collect()(0)
    assert(r.getSeq[Long](0) == dsl.getSeq[Long](0))
    assert(r.getSeq[Long](1) == dsl.getSeq[Long](1))
    assert(r.getAs[Int]("b2") == 0x42)
    assert(r.getAs[Int]("b9") == -1)    // out of range → -1 sentinel
  }

  test("paired minhash and merged-BPE count resolve from SQL with DSL-identical values") {
    val s = sqlSpark
    import s.implicits._
    Seq(("alpha beta vector order customer", Seq("alpha", "beta", "alph")))
      .toDF("txt", "sh").createOrReplaceTempView("t3")
    val r = s.sql(
      """SELECT graft_minhash_md5_paired(sh, 6) AS sig,
        |  graft_bpe_merged_count(txt) AS n,
        |  graft_bpe_encode(txt) AS enc,
        |  graft_minhash_md5_mul(sh, 6) AS sigm,
        |  graft_minhash_md5_mul_text(lower(txt), 5, 6) AS sigt FROM t3""".stripMargin)
      .collect()(0)
    import graft.functions.TextFunctions
    val dsl = s.table("t3").select(
      TextFunctions.pairedMinHashSignature($"sh", 6),
      TextFunctions.bpeMergedTokenCount($"txt"),
      TextFunctions.bpeEncode($"txt"),
      TextFunctions.mulMinHashSignature($"sh", 6),
      TextFunctions.mulMinHashSignatureOfText(lower($"txt"), 5, 6)).collect()(0)
    assert(r.getSeq[Long](0) == dsl.getSeq[Long](0))
    assert(r.getSeq[Long](3) == dsl.getSeq[Long](3))
    assert(r.getSeq[Long](4) == dsl.getSeq[Long](4))
    assert(r.getAs[Long]("n") == dsl.getLong(1))
    // "vector", "order", "customer" are single learned tokens; alpha →
    // al|p|h|a? (al from rank 35) — just pin the DSL equality + a bound
    assert(r.getAs[Long]("n") < 20L && r.getAs[Long]("n") >= 5L)
    // encode agrees with the DSL and its length IS the count
    assert(r.getAs[String]("enc") == dsl.getString(2))
    assert(r.getAs[String]("enc").split(" ").length.toLong == r.getAs[Long]("n"))
  }

  test("trend folds resolve from SQL with DSL-identical states") {
    val s = sqlSpark
    import s.implicits._
    Seq((Seq(10L, 20L, 30L, 40L))).toDF("ys").createOrReplaceTempView("ts")
    val sql = s.sql(
      """SELECT graft_holt_states(ys, 0.5D, 0.5D) AS h,
        |  graft_holt_winters_states(ys, 0.5D, 0.5D, 0.5D, 2) AS hw
        |FROM ts""".stripMargin).collect()(0)
    val h = sql.getSeq[org.apache.spark.sql.Row](0)
    // matches the hand fold: l2 = .5*20+.5*10 = 15, b2 = 2.5
    assert(h(1).getDouble(0) == 15.0 && h(1).getDouble(1) == 2.5)
    // the DSL operator over the same series agrees state for state
    val viaDsl = graft.operators.Trend.holt(
        Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L), ("g", 4L, 40L))
          .toDF("k", "i", "y"), Seq("k"), Seq("i"), "y")
      .orderBy("i").select("level", "trend").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(h.map(r => (r.getDouble(0), r.getDouble(1))).toSeq == viaDsl.toSeq)
    val hw = sql.getSeq[org.apache.spark.sql.Row](1)
    assert(hw.length == 4 && hw(0).getDouble(0) == 10.0)
  }

  test("SQL builders validate arity and constness with clear analysis errors") {
    val s = sqlSpark
    import s.implicits._
    import org.apache.spark.sql.AnalysisException
    Seq((Seq("a", "b"), 4L)).toDF("toks", "n").createOrReplaceTempView("targs")
    // BIGINT literal and CAST both fold to an int — no ClassCastException
    assert(s.sql("SELECT graft_minhash_md5(toks, 4L) AS m FROM targs")
      .collect()(0).getSeq[Long](0).length == 4)
    assert(s.sql("SELECT graft_minhash_xx(toks, CAST(4 AS BIGINT)) AS m FROM targs")
      .collect()(0).getSeq[Long](0).length == 4)
    assert(s.sql("SELECT graft_minhash_xx(toks, CAST(4 AS SMALLINT)) AS m FROM targs")
      .collect()(0).getSeq[Long](0).length == 4)
    val wrongArity = intercept[AnalysisException](
      s.sql("SELECT graft_minhash_md5(toks) FROM targs").collect())
    assert(wrongArity.getMessage.contains("requires 2 parameters"))
    val nonFoldable = intercept[AnalysisException](
      s.sql("SELECT graft_minhash_md5(toks, CAST(n AS INT)) FROM targs").collect())
    assert(nonFoldable.getMessage.contains("foldable"))
    val wrongType = intercept[AnalysisException](
      s.sql("SELECT graft_rhp_bucket(array(1.0f), 'x', 1) FROM targs").collect())
    assert(wrongType.getMessage.toLowerCase.contains("integer"))
    val oneArgArity = intercept[AnalysisException](
      s.sql("SELECT graft_simhash60(toks, 1) FROM targs").collect())
    assert(oneArgArity.getMessage.contains("requires 1 parameters"))
  }
}
