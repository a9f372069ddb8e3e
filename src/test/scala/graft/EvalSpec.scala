package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Model-eval metrics against hand-computed textbook fixtures: tied-score
  * AUC, a worked ECE, and the classic 2×2 kappa example. */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("rocAuc: tie-corrected Mann-Whitney on a worked fixture") {
    // group g: pos scores {3, 2}, neg scores {1, 2}
    // pairs: (3>1)=1, (3>2)=1, (2>1)=1, (2=2)=0.5 -> U=3.5, P*N=4
    // AUC = 0.875 -> 875_000_000 nano
    val df = Seq(("g", true, 3L), ("g", true, 2L), ("g", false, 1L),
      ("g", false, 2L)).toDF("grp", "y", "s")
    val got = Eval.rocAuc(df, "grp", col("y"), col("s")).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L)
    assert(got.getLong(3) == 875000000L)
  }

  test("rocAuc: perfect separation = 1.0; reversed = 0.0; one-class = NULL") {
    val df = Seq(
      ("sep", true, 10L), ("sep", true, 9L), ("sep", false, 1L),
      ("rev", false, 10L), ("rev", true, 1L),
      ("mono", true, 5L), ("mono", true, 7L)).toDF("grp", "y", "s")
    val rows = Eval.rocAuc(df, "grp", col("y"), col("s"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows("sep").contains(1000000000L))
    assert(rows("rev").contains(0L))
    assert(rows("mono").isEmpty)
  }

  test("calibrationEce: per-bin conf/acc and the ALL-row ECE") {
    // bin 9: (y=1, p=900), (y=0, p=900): n=2, n_pos=1, psum=1800
    //   conf = 900_000_000 nano, acc = 500_000_000 nano, gap = 800
    // bin 1: (y=1, p=100): gap = 900
    // ECE = (800+900)*1e6/3 = 566_666_666 nano (floored)
    val df = Seq((true, 900L), (false, 900L), (true, 100L)).toDF("y", "pm")
    val rows = Eval.calibrationEce(df, col("y"), col("pm"), nBins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(9L) == ((2L, 1L, 900000000L)))
    assert(rows(1L) == ((1L, 1L, 100000000L)))
    assert(rows(-1L) == ((3L, 2L, 566666666L)))
  }

  test("calibrationEce: prob=1000 lands in the top bin, not bin nBins") {
    val df = Seq((true, 1000L)).toDF("y", "pm")
    val bins = Eval.calibrationEce(df, col("y"), col("pm"), nBins = 10)
      .filter(col("bin") >= 0L).collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(9L))
  }

  test("cohenKappa: the classic 2x2 worked example") {
    // contingency yes/yes=20, yes/no=5, no/yes=10, no/no=15, N=50
    // p_o = 35/50 = 0.7; p_e = (25*30 + 25*20)/2500 = 0.5
    // kappa = 0.2/0.5 = 0.4 -> 400_000_000 nano
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(got.getLong(0) == 50L)
    assert(got.getLong(1) == 700000000L)
    assert(got.getLong(2) == 500000000L)
    assert(got.getLong(3) == 400000000L)
  }

  test("cohenKappa: perfect agreement = 1.0; NULL raters count as a class") {
    val perfect = Seq(("x", "x"), ("y", "y"), (null, null))
      .toDF("a", "b")
    val got = Eval.cohenKappa(perfect, "a", "b").collect().head
    assert(got.getLong(0) == 3L && got.getLong(1) == 1000000000L)
    assert(got.getLong(3) == 1000000000L)
  }
}
