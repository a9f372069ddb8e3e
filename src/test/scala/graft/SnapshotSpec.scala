package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Snapshot diff and SCD2 history: hand models for every status /
  * interval shape, NULL-safety of the content digest, and run-collapse
  * semantics. */
class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("diff: all four statuses, NULL values compare safely") {
    val old = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, Option.empty[String], 30L), (4L, Some("d"), 40L))
      .toDF("k", "v1", "v2")
    val neu = Seq((1L, Some("a"), 10L),                 // unchanged
      (2L, Some("B"), 20L),                             // changed
      (3L, Option.empty[String], 30L),                  // unchanged (null == null)
      (5L, Some("e"), 50L))                             // added; 4 removed
      .toDF("k", "v1", "v2")
    val got = Snapshot.diff(old, neu, "k", Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  test("diff digest frames fields: shifted boundaries and NULL-vs-empty are CHANGED") {
    val old = Seq((1L, "ab", "c"), (2L, "", "x")).toDF("k", "v1", "v2")
    val neu = Seq((1L, "a", "bc"), (2L, null.asInstanceOf[String], "x"))
      .toDF("k", "v1", "v2")
    val got = Snapshot.diff(old, neu, "k", Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // an unframed concat would hash ("ab","c") == ("a","bc") and "" == NULL
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("T8 apply: upsert/insert/delete, version winners, deterministic ties") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "upsert", 1L, "B2", 22L),   // replace key 2
      (9L, "upsert", 1L, "new", 90L),  // insert key 9
      (3L, "delete", 1L, null, 0L),    // remove key 3
      (7L, "delete", 1L, null, 0L),    // delete of absent key: no-op
      (1L, "upsert", 1L, "old", 11L),  // superseded by the v2 delete…
      (1L, "delete", 2L, null, 0L),    // …which wins on version
      (9L, "upsert", 0L, "stale", 91L) // older upsert loses to v1
    ).toDF("k", "op", "ver", "name", "v")
    val got = Snapshot.applyChanges(base, changes, "k", "op", "ver",
        Seq("name", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(2L -> (("B2", 22L)), 9L -> (("new", 90L))), got.toString)
    // equal-version tie: upsert outranks delete (documented contract)
    val tie = Seq((2L, "delete", 5L, null.asInstanceOf[String], 0L),
      (2L, "upsert", 5L, "kept", 99L)).toDF("k", "op", "ver", "name", "v")
    val tied = Snapshot.applyChanges(base, tie, "k", "op", "ver",
        Seq("name", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tied(2L) == "kept")
    assert(tied.keySet == Set(1L, 2L, 3L))
    // empty changeset: the base passes through untouched
    val noop = Snapshot.applyChanges(base, changes.filter($"ver" < 0L),
        "k", "op", "ver", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(noop == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("T8 apply == single-threaded reference fold on seeded random changesets") {
    var s = 17L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    def rnd(n: Long): Long = math.floorMod(next(), n)
    for (trial <- 1 to 5) {
      val base = (0L until 30L).filter(_ => rnd(2) == 0)
        .map(k => (k, s"v$k", rnd(100)))
      val changes = (0 until 40).map { _ =>
        val k = rnd(35)
        val op = if (rnd(3) == 0) "delete" else "upsert"
        (k, op, rnd(5), s"c$k-${rnd(9)}", rnd(100))
      }
      // reference: per key, winner = max (ver, op, values) with the
      // same struct order the operator declares; then apply
      val winners = changes.groupBy(_._1).map { case (k, cs) =>
        k -> cs.maxBy(c => (c._3, c._2, c._4, c._5))
      }
      val want = (base.map(r => r._1 -> ((r._2, r._3))).toMap.keySet ++ winners.keySet)
        .flatMap { k =>
          winners.get(k) match {
            case Some((_, "delete", _, _, _)) => None
            case Some((_, "upsert", _, nm, v)) => Some(k -> ((nm, v)))
            case _ => base.find(_._1 == k).map(r => k -> ((r._2, r._3)))
          }
        }.toMap
      val got = Snapshot.applyChanges(
          base.toDF("k", "name", "v"),
          changes.toDF("k", "op", "ver", "name", "v"),
          "k", "op", "ver", Seq("name", "v"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("scd2: consecutive repeats collapse; the current interval stays open") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "home", 1L),
      (1L, ts("2024-01-01 11:00:00"), "home", 2L),  // same run
      (1L, ts("2024-01-01 12:00:00"), "work", 3L),
      (1L, ts("2024-01-01 13:00:00"), "home", 4L),  // home AGAIN = new run
      (2L, ts("2024-01-02 09:00:00"), "cafe", 5L))
      .toDF("user_id", "ts", "state", "event_id")
    val got = Snapshot.scd2(e, "user_id", "ts", "state", "event_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "home", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00")), 2L),
      (1L, "work", ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 13:00:00")), 1L),
      (1L, "home", ts("2024-01-01 13:00:00"), None, 1L), // re-entry = NEW interval
      (2L, "cafe", ts("2024-01-02 09:00:00"), None, 1L)))
  }

  test("W11b asOf: boundary-exact time travel over the interval table") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "home", 1L),
      (1L, ts("2024-01-01 12:00:00"), "work", 2L),
      (2L, ts("2024-01-02 09:00:00"), "cafe", 3L))
      .toDF("user_id", "ts", "state", "event_id")
    val iv = Snapshot.scd2(e, "user_id", "ts", "state", "event_id")
    def stateAt(t: String): Map[Long, String] =
      Snapshot.asOf(iv, lit(ts(t)))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // before anyone exists
    assert(stateAt("2024-01-01 09:00:00") == Map.empty)
    // valid_from is INCLUSIVE: at exactly 10:00 user 1 is home
    assert(stateAt("2024-01-01 10:00:00") == Map(1L -> "home"))
    // valid_to is EXCLUSIVE: at exactly 12:00 user 1 is already at work
    assert(stateAt("2024-01-01 12:00:00") == Map(1L -> "work"))
    // open intervals match any later instant; at most one row per key
    assert(stateAt("2024-02-01 00:00:00") == Map(1L -> "work", 2L -> "cafe"))
  }

  test("scd2: consecutive NULL states form ONE interval (IS DISTINCT FROM semantics)") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option.empty[String], 1L),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String], 2L), // same NULL run
      (1L, ts("2024-01-01 12:00:00"), Some("home"), 3L),
      (1L, ts("2024-01-01 13:00:00"), Option.empty[String], 4L)) // NULL again = new run
      .toDF("user_id", "ts", "state", "event_id")
    val got = Snapshot.scd2(e, "user_id", "ts", "state", "event_id")
      .orderBy("valid_from")
      .collect().map(r => (Option(r.getString(1)), r.getLong(4)))
    assert(got.toSeq == Seq((None, 2L), (Some("home"), 1L), (None, 1L)))
  }

  test("scd2 rejects colliding column names with a clear message") {
    val e = Seq((1L, ts("2024-01-01 10:00:00"), "a", 1L, 9L))
      .toDF("user_id", "ts", "state", "event_id", "_run")
    val err = intercept[IllegalArgumentException] {
      Snapshot.scd2(e, "user_id", "ts", "state", "event_id")
    }
    assert(err.getMessage.contains("_run"))
  }

  test("scd2 intervals tile each key's timeline: from(next) == to(prev), no overlap") {
    val e = (0L until 300L).map(i =>
      (i % 5, ts(f"2024-01-${(i % 28) + 1}%02d 0${(i % 9)}:00:00"),
        s"s${(i * 7) % 3}", i)).toDF("user_id", "ts", "state", "event_id")
    val rows = Snapshot.scd2(e, "user_id", "ts", "state", "event_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), Option(r.getTimestamp(3))))
    rows.groupBy(_._1).foreach { case (_, iv) =>
      iv.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
      assert(iv.init.forall(_._3.isDefined) && iv.last._3.isEmpty,
        "only the last interval is open")
    }
  }

  test("T7 digests: shard-mergeable, multiplicity-sensitive, NULL != empty") {
    import graft.operators.Snapshot
    val rows = Seq(("a", Some("x")), ("a", Some("y")), ("b", Some("x")),
      ("b", None), ("b", Some(""))).toDF("g", "v")
    val got = Snapshot.contentDigests(rows, Seq("g"), Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val M = 1152921504606846976L
    // the ALL row merges the group digests without rescanning
    assert(got("ALL")._1 == 5L)
    assert(got("ALL")._2 == (got("a")._2 + got("b")._2) % M)
    // adding a DUPLICATE of an existing row must change the digest
    // (the xor formulation would cancel it)
    val dup = Snapshot.contentDigests(
        rows.unionByName(Seq(("a", Some("x"))).toDF("g", "v")), Seq("g"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dup("a") != got("a")._2)
    assert(dup("a") == (got("a")._2 * 2 - // a held exactly {x, y}; x doubled
      Snapshot.contentDigests(Seq(("a", "y")).toDF("g", "v"), Seq("g"), Seq("v"))
        .filter(col("g") === "a").head.getLong(2) + M) % M)
    // NULL and empty string digest differently (0x00 frame marker)
    val nullRow = Snapshot.contentDigests(
      Seq(("z", Option.empty[String])).toDF("g", "v"), Seq("g"), Seq("v"))
      .filter(col("g") === "z").head.getLong(2)
    val emptyRow = Snapshot.contentDigests(
      Seq(("z", Option(""))).toDF("g", "v"), Seq("g"), Seq("v"))
      .filter(col("g") === "z").head.getLong(2)
    assert(nullRow != emptyRow)
  }

  test("T9 incrementalAgg: merge equals recompute; full retraction drops the key") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
      .toDF("k", "v")
    val baseState = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("vsum"))
    // retract one 'a' row and BOTH... all of 'c'; insert new 'b' and 'd'
    val changes = Seq(("a", 20L, -1L), ("c", 7L, -1L),
      ("b", 100L, 1L), ("d", 1L, 1L)).toDF("k", "v", "sgn")
    val got = Snapshot.incrementalAgg(baseState, changes, Seq("k"), "v", "sgn")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent recompute over the effective row set
    assert(got == Map("a" -> ((1L, 10L)), "b" -> ((2L, 105L)),
      "d" -> ((1L, 1L))))
    assert(!got.contains("c"), "a fully-retracted key must drop from the state")
  }

  test("T9 incrementalAgg: an empty changeset is the identity") {
    val base = Seq(("a", 1L)).toDF("k", "v")
    val st = base.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("vsum"))
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "v", "sgn")
    val got = Snapshot.incrementalAgg(st, empty, Seq("k"), "v", "sgn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 1L)))
  }
}
