package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchJson

/** The bench_full.json section surgery: Bench preserves the sf1 stress
  * section across full rewrites; StressSf1 replaces it. The artifact is
  * a handcrafted one-line JSON, so the splice must be brace-balanced
  * and string-aware, not regex-naive. */
class BenchJsonSpec extends AnyFunSuite {

  private val base =
    """{"metric":"total","value":1.5,"queries":{"q1":0.5,"q2":{"x":1}}}"""

  test("extractSection finds a balanced nested object") {
    val withSf1 = base.stripSuffix("}") +
      ""","sf1":{"total":9.0,"rows":{"a":1},"s":"b{r}ace"}}"""
    assert(BenchJson.extractSection(withSf1, "sf1") ==
      Some("""{"total":9.0,"rows":{"a":1},"s":"b{r}ace"}"""))
    assert(BenchJson.extractSection(base, "sf1").isEmpty)
    // braces inside STRINGS must not unbalance the walk
    assert(BenchJson.extractSection(
      """{"sf1":{"s":"}}}"},"z":1}""", "sf1") == Some("""{"s":"}}}"}"""))
  }

  test("removeSection excises the section and exactly one comma") {
    val withSf1 = base.stripSuffix("}") + ""","sf1":{"total":9.0}}"""
    assert(BenchJson.removeSection(withSf1, "sf1") == base)
    assert(BenchJson.removeSection(base, "sf1") == base)
  }

  test("the Bench rewrite round-trip preserves sf1") {
    // what Bench does on a full run: extract from the old artifact,
    // splice into the fresh JSON line
    val old = base.stripSuffix("}") + ""","sf1":{"total":9.0}}"""
    val fresh = """{"metric":"total","value":2.0,"queries":{"q1":0.7}}"""
    val sec = BenchJson.extractSection(old, "sf1").get
    val merged = fresh.stripSuffix("}") + s""","sf1":$sec}"""
    // stays parseable and carries both the new numbers and the section
    val parsed = ujsonLike(merged)
    assert(parsed.contains(""""value":2.0""") && parsed.contains(""""sf1":{"total":9.0}"""))
  }

  // no JSON lib on the classpath by design — a contains-check plus a
  // brace-balance assertion stands in
  private def ujsonLike(s: String): String = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; assert(depth >= 0, s"unbalanced at $i")
        case _ => ()
      }
      i += 1
    }
    assert(depth == 0, "unbalanced JSON")
    s
  }
}
