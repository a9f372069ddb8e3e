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

  test("J11 Allen relations: all 13 arms classify correctly, keys never cross") {
    import spark.implicits._
    // reference interval per key is "a"; the partner encodes its case.
    // ids chosen so the reference sorts FIRST (a_id < b_id) for the
    // direct relations and SECOND for the inverse ones.
    val iv = Seq(
      ("k1", "a", 10L, 20L), ("k1", "b_precedes", 30L, 40L),
      ("k2", "a", 10L, 20L), ("k2", "b_meets", 20L, 30L),
      ("k3", "a", 10L, 20L), ("k3", "b_overlaps", 15L, 30L),
      ("k4", "a", 10L, 20L), ("k4", "b_started", 10L, 30L),   // a starts b
      ("k5", "a", 10L, 20L), ("k5", "b_around", 5L, 30L),     // a during b
      ("k6", "a", 10L, 20L), ("k6", "b_fin", 5L, 20L),        // a finishes... a_s>b_s, a_e=b_e
      ("k7", "a", 10L, 20L), ("k7", "b_equal", 10L, 20L),
      // inverse arms: the "a" side of the pair is the longer/later one
      ("i1", "z", 30L, 40L), ("i1", "a_first", 10L, 20L),   // (a_first, z): precedes
      ("i2", "z", 10L, 20L), ("i2", "a_later", 30L, 40L),   // z ends before a starts
      ("i3", "z", 10L, 20L), ("i3", "a_met", 20L, 30L),     // z ends where a starts
      ("i4", "z", 10L, 20L), ("i4", "a_longer", 10L, 30L),  // share start, a longer
      ("i5", "z", 10L, 20L), ("i5", "a_big", 5L, 30L),      // a strictly around z
      ("i6", "z", 10L, 20L), ("i6", "a_long", 5L, 20L),     // share end, a longer
      ("i7", "z", 15L, 30L), ("i7", "a_overby", 20L, 40L)   // a overlapped by z
    ).toDF("k", "id", "s", "e")
    val got = graft.operators.Sessionize.allenRelations(iv, "k", "id", "s", "e")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    assert(got("k1")._3 == "precedes")
    assert(got("k2")._3 == "meets")
    assert(got("k3")._3 == "overlaps")
    assert(got("k4")._3 == "starts")
    assert(got("k5")._3 == "during")
    assert(got("k6")._3 == "finishes")
    assert(got("k7")._3 == "equals")
    assert(got("i1")._3 == "precedes")      // (a_first, z)
    assert(got("i2")._3 == "preceded_by")   // z before a_later
    assert(got("i3")._3 == "met_by")        // z ends where a_met starts
    assert(got("i4")._3 == "started_by")    // a_longer started by z
    assert(got("i5")._3 == "contains")      // a_big contains z
    assert(got("i6")._3 == "finished_by")   // a_long finished by z
    assert(got("i7")._3 == "overlapped_by") // z overlaps into a_overby
    // one pair per key, never across keys
    assert(got.size == 14)
  }
}
