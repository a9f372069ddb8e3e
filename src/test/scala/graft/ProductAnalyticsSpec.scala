package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.ProductAnalytics

/** Event-sequence analytics: funnel ordering semantics, the retention
  * triangle, and transition-matrix normalization — all against hand
  * models. */
class ProductAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1 completes view→click→purchase in order; u2 clicks BEFORE its
  // first view (must not count) and never purchases; u3 views only;
  // u4 never views (absent from the funnel even though it purchases)
  private lazy val funnelEvents = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view", 1L),
    (1L, ts("2024-01-01 10:05:00"), "click", 2L),
    (1L, ts("2024-01-01 10:30:00"), "purchase", 3L),
    (2L, ts("2024-01-02 08:00:00"), "click", 4L),
    (2L, ts("2024-01-02 09:00:00"), "view", 5L),
    (3L, ts("2024-01-03 12:00:00"), "view", 6L),
    (4L, ts("2024-01-04 12:00:00"), "purchase", 7L))
    .toDF("user_id", "ts", "event_type", "event_id")

  test("funnel: strictly-after chaining, NULL once the chain breaks") {
    val got = ProductAnalytics
      .funnelTimes(funnelEvents, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3)))
    assert(got.length == 3, "only step-1 users appear")
    assert(got(0) == ((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:05:00"), ts("2024-01-01 10:30:00"))))
    // u2's click predates its view: t2 must be NULL, not the 08:00 click
    assert(got(1) == ((2L, ts("2024-01-02 09:00:00"), null, null)))
    assert(got(2) == ((3L, ts("2024-01-03 12:00:00"), null, null)))
  }

  test("funnel: a later same-type event after the previous step still counts") {
    val e = Seq(
      (9L, ts("2024-01-01 08:00:00"), "click", 1L), // too early
      (9L, ts("2024-01-01 09:00:00"), "view", 2L),
      (9L, ts("2024-01-01 09:30:00"), "click", 3L)) // counts
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = ProductAnalytics
      .funnelTimes(e, "user_id", "ts", "event_type", Seq("view", "click"))
      .collect().head
    assert(got.getTimestamp(2) == ts("2024-01-01 09:30:00"))
  }

  test("retention: cohort day is the first-seen day; offsets count distinct users") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")), (2L, ts("2024-01-02 11:00:00")),
      (3L, ts("2024-01-02 09:00:00")))
      .toDF("user_id", "ts")
    val got = ProductAnalytics.retention(e, "user_id", "ts")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd"),
        col("day_offset"), col("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L),  // u1+u2 on their own day (dup same-day rows collapse)
      ("2024-01-01", 1L, 1L),  // u2 back next day
      ("2024-01-01", 2L, 1L),  // u1 back on day 3
      ("2024-01-02", 0L, 1L))) // u3's own cohort
  }

  test("transitions: bigrams follow (ts, tie) order and rows normalize to 1") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:01:00"), "b", 2L),
      (1L, ts("2024-01-01 10:02:00"), "a", 3L),
      (2L, ts("2024-01-01 10:00:00"), "a", 4L),
      (2L, ts("2024-01-01 10:03:00"), "b", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = ProductAnalytics
      .transitions(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // a→b twice (u1, u2), b→a once (u1); no cross-user bigram
    assert(got == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0))))
    val byRow = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    byRow.foreach { case (row, p) => assert(math.abs(p - 1.0) < 1e-9, row) }
  }

  test("sequence patterns: consecutive same-user trigrams, counts + support") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:01:00"), "b", 2L),
      (1L, ts("2024-01-01 10:02:00"), "c", 3L),
      (1L, ts("2024-01-01 10:03:00"), "b", 4L),
      (1L, ts("2024-01-01 10:04:00"), "c", 5L),
      (2L, ts("2024-01-02 10:00:00"), "a", 6L),
      (2L, ts("2024-01-02 10:01:00"), "b", 7L),
      (2L, ts("2024-01-02 10:02:00"), "c", 8L),
      (3L, ts("2024-01-03 10:00:00"), "x", 9L),   // 2 events: no trigram
      (3L, ts("2024-01-03 10:01:00"), "y", 10L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = ProductAnalytics
      .sequencePatterns(e, "user_id", "ts", "event_type", "event_id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a>b>c twice (u1, u2) support 2; u1 alone adds b>c>b and c>b>c
    assert(got.toSet == Set(("a>b>c", 2L, 2L), ("b>c>b", 1L, 1L),
      ("c>b>c", 1L, 1L)), got.mkString(", "))
    // ordered by count desc then pattern — the k cut is deterministic
    assert(got.head == (("a>b>c", 2L, 2L)))
    assert(got(1)._1 == "b>c>b" && got(2)._1 == "c>b>c")
    val top1 = ProductAnalytics
      .sequencePatterns(e, "user_id", "ts", "event_type", "event_id", n = 3, k = 1)
      .collect()
    assert(top1.length == 1 && top1.head.getString(0) == "a>b>c")
  }

  test("sequence patterns at n=2 agree with the transition-matrix counts") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:01:00"), "b", 2L),
      (1L, ts("2024-01-01 10:02:00"), "a", 3L),
      (2L, ts("2024-01-01 11:00:00"), "a", 4L),
      (2L, ts("2024-01-01 11:01:00"), "b", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val pat = ProductAnalytics
      .sequencePatterns(e, "user_id", "ts", "event_type", "event_id", n = 2, k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trans = ProductAnalytics
      .transitions(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => s"${r.getString(0)}>${r.getString(1)}" -> r.getLong(2)).toMap
    assert(pat == trans)
    intercept[IllegalArgumentException](ProductAnalytics
      .sequencePatterns(e, "user_id", "ts", "event_type", "event_id", n = 1))
    intercept[IllegalArgumentException](ProductAnalytics
      .sequencePatterns(e, "user_id", "ts", "event_type", "event_id", k = 0))
  }

  test("funnel matches a single-threaded reference on seeded random schedules") {
    // reference: t1 = min ts of step-1 events; t_i = min ts of step-i
    // events STRICTLY after t_{i-1}, None once the chain breaks
    def reference(events: Seq[(Long, Long, String)], steps: Seq[String])
        : Map[Long, Seq[Option[Long]]] =
      events.groupBy(_._1).flatMap { case (u, es) =>
        val byStep = es.groupBy(_._3).map { case (k, v) => k -> v.map(_._2) }
        byStep.getOrElse(steps.head, Nil).minOption.map { t1 =>
          u -> steps.tail.foldLeft(Seq[Option[Long]](Some(t1))) { (acc, step) =>
            acc :+ acc.last.flatMap(p =>
              byStep.getOrElse(step, Nil).filter(_ > p).minOption)
          }
        }
      }
    var s = 7L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    val types = Seq("view", "click", "purchase", "noise")
    val events = (0 until 2000).map { _ =>
      (math.floorMod(next(), 40L),                  // user
        math.floorMod(next(), 100000L),             // epoch-second
        types(math.floorMod(next(), 4L).toInt))
    }
    val df = events.map { case (u, t, ty) =>
      (u, new java.sql.Timestamp(t * 1000L), ty) }.toDF("user_id", "ts", "event_type")
    val got = graft.operators.ProductAnalytics
      .funnelTimes(df, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (1 to 3).map(i =>
        Option(r.getTimestamp(i)).map(_.getTime / 1000L)).toSeq).toMap
    // duplicate (user, ts) pairs make min() well-defined either way;
    // the reference uses the same min-by-time semantics
    val want = reference(events, Seq("view", "click", "purchase"))
    assert(got.keySet == want.keySet)
    got.foreach { case (u, seq) => assert(seq == want(u), s"user $u") }
  }

  test("transitions: same-timestamp events break ties on the tiebreaker column") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "x", 2L),
      (1L, ts("2024-01-01 10:00:00"), "y", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = ProductAnalytics
      .transitions(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("y", "x")), "event_id order decides the bigram direction")
  }
}
