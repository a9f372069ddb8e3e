package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.TextSources

/** JSONL/CSV quarantine ingestion: malformed lines route to the
  * quarantine frame with raw text intact; well-formed rows parse; no
  * line is lost or doubled. */
class TextSourcesSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("jsonl: good rows parse, corrupt lines quarantine with raw bytes") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      ("""{"doc_id": 1, "text": "hello"}""" + "\n" +
        """{"doc_id": 2, "text": "world"}""" + "\n" +
        """{"doc_id": 3 "text": "missing comma"}""" + "\n" +
        """not json at all""" + "\n").getBytes("UTF-8"))
    val (good, quarantine) = TextSources.jsonl(spark, dir, docSchema)
    assert(good.columns.toSeq == Seq("doc_id", "text"))
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == Set((1L, "hello"), (2L, "world")))
    val q = quarantine.select("raw_line").collect()
      .map(_.getString(0)).toSet
    assert(q == Set("""{"doc_id": 3 "text": "missing comma"}""",
      "not json at all"), q.toString)
  }

  test("csv: arity and cast failures quarantine whole rows") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "a.csv"),
      ("doc_id,text\n" +
        "1,hello\n" +
        "not_a_number,world\n" +   // uncastable doc_id
        "2,ok\n").getBytes("UTF-8"))
    val (good, quarantine) = TextSources.csv(spark, dir, docSchema)
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == Set((1L, "hello"), (2L, "ok")))
    val q = quarantine.select("raw_line").collect()
      .map(_.getString(0)).toSet
    assert(q == Set("not_a_number,world"))
  }

  test("csv: a DATA row equal to the header string stays data; one header drops per file") {
    val strSchema = StructType(Seq(
      StructField("name", StringType), StructField("city", StringType)))
    val dir = Files.createTempDirectory("graft_csv_hdr").toString
    // file A: a real data row spells exactly "name,city" mid-file —
    // it must parse as data, never vanish from both channels
    Files.write(java.nio.file.Paths.get(dir, "a.csv"),
      ("name,city\n" +
        "alice,berlin\n" +
        "name,city\n" +         // DATA (a person named "name" in "city")
        "bob,tokyo\n").getBytes("UTF-8"))
    // file B: its own header must also drop (one per file)
    Files.write(java.nio.file.Paths.get(dir, "b.csv"),
      ("name,city\n" + "carol,oslo\n").getBytes("UTF-8"))
    val (good, quarantine) = TextSources.csv(spark, dir, strSchema)
    val g = good.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(g == Map(("alice", "berlin") -> 1, ("name", "city") -> 1,
      ("bob", "tokyo") -> 1, ("carol", "oslo") -> 1),
      s"the header-shaped data row must survive exactly once: $g")
    assert(quarantine.count() == 0)
  }

  test("schema colliding with the corrupt column is rejected up front") {
    val bad = StructType(Seq(StructField(TextSources.CorruptCol, StringType)))
    intercept[IllegalArgumentException](
      TextSources.jsonl(spark, "/tmp/nope", bad))
  }
}
