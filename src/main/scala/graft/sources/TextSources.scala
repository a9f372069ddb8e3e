package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, from_csv, from_json, lit, min, monotonically_increasing_id}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Text-format ingestion with a QUARANTINE channel — the S2 stance
  * ("rejects are data, not exceptions": FrameParser returns reject
  * reasons, never throws) applied to the bulk formats a curation
  * pipeline actually receives: JSONL crawls and CSV exports. One
  * malformed line among billions must neither kill the job (FAILFAST)
  * nor silently vanish (DROPMALFORMED): the parser routes it, raw
  * line intact, into a quarantine frame for inspection/replay while
  * well-formed rows flow on.
  *
  * Implementation note: Spark's built-in json/csv readers FORBID
  * queries that reference only their internal corrupt-record column
  * (the natural quarantine query), steering users toward caching the
  * whole scan — wrong at 100 TB. These readers therefore scan the
  * file as TEXT (one string column — trivially prunable/splittable)
  * and parse with `from_json`/`from_csv` carrying an explicit corrupt
  * column: both channels are filters over the same lazy relation, no
  * caching, no restriction, and the quarantine's raw line is the
  * scan's own value column. Schema is supplied, never inferred
  * (inference is a full extra pass and non-deterministic under
  * sampling).
  */
object TextSources {

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain '$CorruptCol'")
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
  }

  private val ParseOpts = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  private def split(parsed: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val bad = col(s"_s.$CorruptCol").isNotNull || col("_s").isNull
    (parsed.filter(!bad)
        .select(schema.fieldNames.map(f => col(s"_s.$f")): _*),
      parsed.filter(bad).select(col("value").as("raw_line")))
  }

  /** JSONL (one JSON object per line): (good, quarantine). `good` has
    * exactly `schema`'s columns; `quarantine` is (raw_line). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val s = withCorrupt(schema)
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), s, ParseOpts).as("_s"))
    split(parsed, schema)
  }

  /** CSV with optional header: same split. A row with the wrong arity
    * or an uncastable cell quarantines whole, raw text preserved; with
    * `header = true` exactly ONE line per file — the file's FIRST
    * header-shaped line — is excluded from both channels. A DATA row
    * that happens to equal the header string ("name,city" in a
    * name/city table) stays data: a bare equality filter would vanish
    * it from both channels, the exact silent loss this module exists
    * to prevent. The header lines are found per file over the
    * header-EQUAL candidates only (a corpus-tiny set), so the
    * exclusion is one broadcast anti join, never a full-scan window. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): (DataFrame, DataFrame) = {
    val s = withCorrupt(schema)
    val raw = spark.read.text(path)
    val body =
      if (!header) raw
      else {
        // line identity = (file, monotonic id), SCOPED TO THE FILE'S
        // OFFSET-0 SPLIT: the leading header (line 1 of every file, by
        // the header contract) lives in the split whose
        // `file_block_start` is 0, and that one split is read as a
        // single contiguous run, within which monotonic ids ascend in
        // row order BY CONSTRUCTION (partitionId << 33 + per-partition
        // counter). min(id) over the header-equal lines of that split
        // is therefore the file's first line — with NO dependence on
        // how Spark orders splits across partitions (an unscoped
        // min(id) over the whole file assumed the offset-0 split got
        // the lowest partition index, an internal ordering detail).
        val lines = raw.select(col("value"),
          col("_metadata.file_path").as("_file"),
          col("_metadata.file_block_start").as("_bstart"),
          monotonically_increasing_id().as("_mid"))
        val hdr = lit(schema.fieldNames.mkString(delimiter))
        val firsts = lines.filter(col("value") === hdr && col("_bstart") === 0)
          .groupBy(col("_file")).agg(min(col("_mid")).as("_hmid"))
        lines.join(broadcast(firsts),
            lines("_file") === firsts("_file") &&
              lines("_mid") === firsts("_hmid"), "left_anti")
          .select(col("value"))
      }
    val parsed = body.select(col("value"),
      from_csv(col("value"), s, ParseOpts ++ Map("delimiter" -> delimiter)).as("_s"))
    split(parsed, schema)
  }
}
