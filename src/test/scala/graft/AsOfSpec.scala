package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOf

/** The custom as-of join operator (LogicalPlan + Strategy + SparkPlan)
  * vs the compose-path formulation (range join + top-1 window) — the
  * two must agree row for row on randomized data; edge cases pinned. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  /** Reference implementation from built-ins: all qualifying pairs,
    * rank by right time desc, keep top 1. */
  private def composeAsOf(left: DataFrame, right: DataFrame,
      toleranceUs: Long): DataFrame = {
    val cond = col("k") === col("rk") && col("rt") <= col("t") &&
      (if (toleranceUs < 0) lit(true)
       else unix_micros(col("t")) - unix_micros(col("rt")) <= toleranceUs)
    val w = Window.partitionBy("lid").orderBy(col("rt").desc, col("rv").desc)
    left.join(right, cond, "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rv"))
  }

  private def randomCase(seedN: Long, tolUs: Long): Unit = {
    val params = Gen.Parameters.default
    def sample[A](g: Gen[A], s: Long): A =
      g.apply(params, Seed(s)).get
    val nL = 200; val nR = 150
    val lRows = (0 until nL).map { i =>
      (i.toLong, "k" + sample(Gen.chooseNum(0, 6), seedN + i),
        ts(sample(Gen.chooseNum(0L, 100000L), seedN * 7 + i)))
    }
    val rRows = (0 until nR).map { i =>
      (1000L + i, "k" + sample(Gen.chooseNum(0, 6), seedN * 13 + i),
        ts(sample(Gen.chooseNum(0L, 100000L), seedN * 31 + i)))
    }
    // unique (key, time) on the right so "latest" is unambiguous
    val lDf = lRows.toDF("lid", "k", "t")
    val rDf = rRows.toDF("rv", "rk", "rt")
      .withColumn("rn0", row_number().over(
        Window.partitionBy("rk", "rt").orderBy(col("rv").desc)))
      .filter(col("rn0") === 1).drop("rn0")

    val got = AsOf.join2(lDf, rDf, Seq("k"), Seq("rk"), "t", "rt", tolUs)
      .select(col("lid"), col("rv"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = composeAsOf(lDf, rDf, tolUs)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got.size == nL)
    assert(got == want, s"seed $seedN tol $tolUs")
  }

  test("matches the compose formulation on random data (unbounded)") {
    Seq(1L, 2L, 3L).foreach(randomCase(_, -1L))
  }

  test("matches the compose formulation with tolerance") {
    Seq(4L, 5L).foreach(randomCase(_, 5000L * 1000L))  // 5s
  }

  test("edge semantics: equal times match, later rights don't, null keys don't") {
    val l = Seq((1L, "a", ts(1000)), (2L, "a", ts(500)), (3L, null.asInstanceOf[String], ts(1000)))
      .toDF("lid", "k", "t")
    val r = Seq((10L, "a", ts(1000)), (11L, "a", ts(700)))
      .toDF("rv", "rk", "rt")
    val got = AsOf.join2(l, r, Seq("k"), Seq("rk"), "t", "rt", -1L)
      .select("lid", "rv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got(1L) == 10L)   // equal time matches (latest wins over 700)
    assert(got(2L) == -1L)   // nothing at or before 500
    assert(got(3L) == -1L)   // null key never matches
  }

  test("null times: left null-time rows match nothing, right null-time rows are skipped") {
    val l = Seq((1L, "a", ts(1000)), (2L, "a", null.asInstanceOf[Timestamp]))
      .toDF("lid", "k", "t")
    val r = Seq((10L, "a", ts(900)), (11L, "a", null.asInstanceOf[Timestamp]))
      .toDF("rv", "rk", "rt")
    val got = AsOf.join2(l, r, Seq("k"), Seq("rk"), "t", "rt", -1L)
      .select("lid", "rv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got(1L) == 10L)   // the null-time right row is never a candidate
    assert(got(2L) == -1L)   // a null left time matches nothing, row still kept
  }

  test("non-long-backed time columns are rejected at plan time, not runtime") {
    val l = Seq((1L, "a", 5)).toDF("lid", "k", "t")       // INT time
    val r = Seq((9L, "a", ts(0))).toDF("rv", "rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join2(l, r, Seq("k"), Seq("rk"), "t", "rt", -1L)
    }
    assert(e.getMessage.contains("TIMESTAMP or BIGINT"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join2(l.withColumn("t", col("t").cast("timestamp")),
        r.withColumn("rk", col("rk").cast("binary")), Seq("k"), Seq("rk"), "t", "rt", -1L)
    }
    assert(e2.getMessage.contains("key type mismatch"))
  }

  test("forward as-of via negated times picks the EARLIEST row at-or-after") {
    val clicks = Seq(
      (1L, "u1", ts(100)), // purchases at 150, 200 → 150 wins
      (2L, "u1", ts(151)), // only 200 remains ahead
      (3L, "u1", ts(300)), // nothing ahead → null
      (4L, "u2", ts(100))  // other key, purchase at 100 (t equal counts)
    ).toDF("cid", "k", "t").withColumn("nt", -unix_micros(col("t")))
    val purchases = Seq(
      (10L, "u1", ts(150)), (11L, "u1", ts(200)), (12L, "u2", ts(100))
    ).toDF("pid", "rk", "pt").withColumn("npt", -unix_micros(col("pt")))
    val got = AsOf.join2(clicks, purchases,
        Seq("k"), Seq("rk"), "nt", "npt", toleranceUs = -1L)
      .select(col("cid"), col("pid")).orderBy("cid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == Seq((1L, Some(10L)), (2L, Some(11L)),
      (3L, None), (4L, Some(12L))))
  }

  test("physical plan is the custom sort-merge exec, not a pair join") {
    val l = Seq((1L, "a", ts(0))).toDF("lid", "k", "t")
    val r = Seq((9L, "a", ts(0))).toDF("rv", "rk", "rt")
    val df = AsOf.join2(l, r, Seq("k"), Seq("rk"), "t", "rt", -1L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p)  // node name prints without "Exec"
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"))
  }
}
