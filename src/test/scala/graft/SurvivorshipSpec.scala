package graft

import org.apache.spark.sql.Row

import graft.operators.Survivorship
import graft.operators.Survivorship._

/** Field-level survivorship: each rule's election semantics, the
  * deterministic tie-breaks, and the argument guards. */
class SurvivorshipSpec extends SparkTestBase {
  import spark.implicits._

  // (cluster, price, brand, size, version)
  private val recs = Seq(
    ("e1", 10.0, "A", 5, 1L),
    ("e1", 30.0, "B", 7, 3L),
    ("e1", 20.0, "C", 7, 2L),
    ("e2", 5.0, "Z", 9, 9L)
  ).toDF("entity", "price", "brand", "size", "ver")

  test("Max/Min/Latest/Mode elect the right values per cluster") {
    val g = Survivorship.goldenRecord(recs, "entity", Seq(
        "p_max" -> MaxOf("price"),
        "p_min" -> MinOf("price"),
        "b_latest" -> LatestOf("brand", "ver", "ver"),
        "s_mode" -> ModeOf("size")))
      .orderBy("entity").collect()
    assert(g.toSeq == Seq(
      Row("e1", 3L, 30.0, 10.0, "B", 7),
      Row("e2", 1L, 5.0, 5.0, "Z", 9)))
  }

  test("mode ties break toward the smallest value; latest ties toward tieCol max") {
    val df = Seq(
      ("k", 9, "x", 1L, 10L),  // size 9 ×1, size 2 ×1 → tie → smallest (2)
      ("k", 2, "y", 1L, 20L)   // same ver → tieCol (id) max wins → "y"
    ).toDF("entity", "size", "brand", "ver", "id")
    val g = Survivorship.goldenRecord(df, "entity", Seq(
        "s_mode" -> ModeOf("size"),
        "b_latest" -> LatestOf("brand", "ver", "id")))
      .collect().head
    assert(g.getInt(2) == 2)
    assert(g.getString(3) == "y")
  }

  test("column order is key, n_records, then rules in caller order") {
    val g = Survivorship.goldenRecord(recs, "entity",
      Seq("a" -> MaxOf("price"), "b" -> ModeOf("size"), "c" -> MinOf("ver")))
    assert(g.columns.toSeq == Seq("entity", "n_records", "a", "b", "c"))
  }

  test("guards: empty rules, duplicate outputs, reserved names") {
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(recs, "entity", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(recs, "entity",
        Seq("x" -> MaxOf("price"), "x" -> MinOf("price")))
    }
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(recs, "entity",
        Seq("n_records" -> MaxOf("price")))
    }
  }

  test("empty input yields an empty golden table, not an error") {
    val g = Survivorship.goldenRecord(recs.filter($"price" < 0), "entity",
      Seq("p" -> MaxOf("price"), "m" -> ModeOf("size")))
    assert(g.count() == 0)
  }
}
