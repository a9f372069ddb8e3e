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
    // session_window parity: the session end is EXCLUSIVE, so a gap of
    // exactly 30 min starts a new session (>=, like ST4's oracle).
    // user A: events at 0, 10, 20 (one session), 60 (gap 40 >= 30), 70
    // user B: events at 0, 29 (gap 29 < 30 → same), 59 (gap 30 → SPLIT)
    val df = Seq(
      ("A", ts(0), 1L), ("A", ts(10), 2L), ("A", ts(20), 3L),
      ("A", ts(60), 4L), ("A", ts(70), 5L),
      ("B", ts(0), 6L), ("B", ts(29), 7L), ("B", ts(59), 8L))
      .toDF("user_id", "t", "event_id")
    val got = Sessionize.sessions(df, "user_id", "t", col("event_id"), 1800L)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getAs[Long]("duration_s")))
    assert(got.toSeq == Seq(
      ("A", 1L, 3L, 1200L),   // 0..20 min
      ("A", 2L, 2L, 600L),    // 60..70
      ("B", 1L, 2L, 1740L),   // 0..29 — gap 29 < 30 stays joined
      ("B", 2L, 1L, 0L)))     // 59 — gap exactly 30 min SPLITS
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
