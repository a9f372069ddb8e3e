package graft

import java.sql.Timestamp

import graft.operators.Profile

/** Q3 one-pass table profile. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: nulls, exact distincts, typed min/max, column subset") {
    val df = Seq(
      (1L, Some("a"), Some(Timestamp.valueOf("2024-01-01 00:00:00.25"))),
      (2L, Some("b"), None),
      (3L, None, Some(Timestamp.valueOf("2024-02-03 04:05:06.007"))),
      (4L, Some("a"), None)).toDF("id", "s", "t")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("t") == ((4L, 2L, 2L,
      "2024-01-01 00:00:00.250", "2024-02-03 04:05:06.007")))
    assert(Profile.profile(df, Seq("s")).count() == 1)
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }

  test("autoExpectations: learned bounds pass a clean target, fail a dirtied one") {
    val ref = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("a")), (4L, Some("b")))
      .toDF("id", "s")
    // clean target: same shape → every check passes
    val clean = Seq((5L, Some("b")), (6L, Some("a"))).toDF("id", "s")
    val ok = Profile.autoExpectations(ref, clean).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(ok == Map("id" -> true, "s" -> true), ok)
    // dirty target: half the s values null → null_ok fails for s only
    val dirty = Seq((5L, Some("a")), (6L, None)).toDF("id", "s")
    val bad = Profile.autoExpectations(ref, dirty).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Boolean]("null_ok"), r.getAs[Boolean]("pass")))).toMap
    assert(bad("s") == ((false, false)), bad)
    assert(bad("id") == ((true, true)))
    // empty target: rows_ok fails, nothing divides by zero
    val empty = Profile.autoExpectations(ref, ref.limit(0)).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("rows_ok")).toMap
    assert(empty.values.forall(_ == false))
    intercept[IllegalArgumentException](
      Profile.autoExpectations(ref, clean, nullSlackPpm = -1L))
  }

  test("profileDrift: planted null drift fires, stable columns stay quiet, empty side is NULL not crash") {
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("a")), (4L, Some("b")))
      .toDF("id", "s")
    val after = Seq((5L, Some("a")), (6L, None), (7L, None), (8L, Some("b")))
      .toDF("id", "s")
    val got = Profile.profileDrift(before, after).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(3) == 0L && s.getLong(4) == 500000L,
      "null ppm must move 0 → 500000 for the dirtied column")
    val id = got("id")
    assert(id.getLong(3) == 0L && id.getLong(4) == 0L)
    assert(id.getBoolean(7) && id.getBoolean(8), "id min/max shift with the window")
    // empty after-side: ppm NULL (defined absence), report still emits
    val drift = Profile.profileDrift(before, before.limit(0)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(drift("s").isNullAt(4) && drift("s").getLong(2) == 0L)
  }
}
