package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Sessionize, TextAnalysis}

/** Batch sessionization (W6 — batch twin of ST4) and TF-IDF (L4c)
  * against hand-computed expectations. */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("gap-based sessions split exactly at the threshold boundary") {
    // session_window parity: Spark merges TOUCHING windows, so a gap of
    // exactly 30 min stays in one session; only a gap > 30 min splits
    // (verified against session_window itself in the randomized test).
    // user A: events at 0, 10, 20 (one session), 60 (gap 40 > 30), 70
    // user B: events at 0, 31 (gap 31 > 30 → split), 61 (gap 30 → same)
    val df = Seq(
      ("A", ts(0), 1L), ("A", ts(10), 2L), ("A", ts(20), 3L),
      ("A", ts(60), 4L), ("A", ts(70), 5L),
      ("B", ts(0), 6L), ("B", ts(31), 7L), ("B", ts(61), 8L))
      .toDF("user_id", "t", "event_id")
    val got = Sessionize.sessions(df, "user_id", "t", col("event_id"), 1800L)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getAs[Long]("duration_s")))
    assert(got.toSeq == Seq(
      ("A", 1L, 3L, 1200L),   // 0..20 min
      ("A", 2L, 2L, 600L),    // 60..70
      ("B", 1L, 1L, 0L),      // 0
      ("B", 2L, 2L, 1800L)))  // 31..61 — gap exactly 30 min stays joined
  }

  test("interval merge: containment, touching, and disjoint islands (W9)") {
    // key A: [0,100) swallows [10,20) AND bridges to [90,150) (overlap),
    //        [150,160) TOUCHES 150 → still merged (strict > splits),
    //        [200,210) disjoint → new island.
    // The containment case is exactly what a lag(end)-based merge gets
    // wrong: after [10,20), lag(end)=20 would wrongly split [90,150).
    // key B: single interval passes through.
    val df = Seq(
      ("A", 0L, 100L, 1L), ("A", 10L, 20L, 2L), ("A", 90L, 150L, 3L),
      ("A", 150L, 160L, 4L), ("A", 200L, 210L, 5L),
      ("B", 5L, 6L, 6L))
      .toDF("k", "s", "e", "id")
    val got = Sessionize.mergeIntervals(df, "k", "s", "e", col("id"))
      .orderBy("k", "interval_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("A", 1L, 0L, 160L, 4L),
      ("A", 2L, 200L, 210L, 1L),
      ("B", 1L, 5L, 6L, 1L)))
  }

  test("interval merge output is disjoint and covers every input row") {
    val rng = new scala.util.Random(11L)
    val rows = for { k <- 0 until 6; i <- 0 until 80 } yield {
      val s = rng.nextInt(2000).toLong
      (s"k$k", s, s + 1 + rng.nextInt(60), (k * 1000 + i).toLong)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val merged = Sessionize.mergeIntervals(df, "k", "s", "e", col("id")).collect()
    assert(merged.map(_.getLong(4)).sum == rows.length)
    merged.groupBy(_.getString(0)).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) < b.getLong(2),
            s"islands must be strictly separated: $a then $b")
        case _ =>
      }
    }
    // every input interval lands inside one merged span
    val spans = merged.map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    rows.foreach { case (k, s, e, _) =>
      assert(spans.exists { case (mk, ms, me) => mk == k && ms <= s && e <= me })
    }
  }

  test("sessionize == session_window on randomized data (true batch twin)") {
    // seeded pseudo-random event times, several users, gaps straddling
    // the threshold — both formulations must produce the SAME sessions
    val rng = new scala.util.Random(7L)
    val rows = for {
      u <- 0 until 8
      i <- 0 until 60
    } yield (s"u$u", ts(rng.nextInt(600).toLong), (u * 100 + i).toLong)
    val df = rows.toDF("user_id", "t", "event_id").dropDuplicates("user_id", "t")
    val gapMin = 15
    val viaOp = Sessionize
      .sessions(df, "user_id", "t", col("event_id"), gapMin * 60L)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val viaSW = df
      .groupBy(session_window(col("t"), s"$gapMin minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(viaOp == viaSW)
  }

  test("sessionize plans ONE window exchange (shared partitioning/order)") {
    val df = Seq(("A", ts(0), 1L)).toDF("user_id", "t", "event_id")
    val plan = Sessionize.assign(df, "user_id", "t", col("event_id"), 1800L)
      .queryExecution.executedPlan.toString
    // lag and the running sum must share one sort/partitioning: a single
    // Window block (or two contiguous ones over the same exchange), and
    // exactly one hashpartitioning on user_id
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
  }

  test("tf-idf top terms: scores and ranking match a hand model") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, 2)
      .orderBy("doc_id", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    // doc1: apple tf2 → 2*3/1=6.0; banana 1*3/2=1.5
    // doc2: cherry 1*3/2=1.5; banana 1.5 → tie broken by token: banana first
    // doc3: cherry tf2 → 3.0; date 1*3/1=3.0 → tie: cherry before date
    assert(got.toSeq == Seq(
      (1L, "apple", 6.0), (1L, "banana", 1.5),
      (2L, "banana", 1.5), (2L, "cherry", 1.5),
      (3L, "cherry", 3.0), (3L, "date", 3.0)))
  }
}
