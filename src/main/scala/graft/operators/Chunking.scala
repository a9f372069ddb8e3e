package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking (SURVEY §2.10 EXT) — splitting long documents into
  * bounded, overlapping windows for embedding/training pipelines (the
  * context-window prep step: every chunk fits the model, the overlap
  * preserves cross-boundary context).
  *
  * Map-only and shuffle-free: `sequence` + `explode` + `substr` run
  * inside the scan's whole-stage codegen, so at 100 TB the chunker is
  * pure scan bandwidth — no state, no exchange, and the output inherits
  * the input partitioning (chunks of one document stay in its partition).
  */
object Chunking {

  /** Character-window chunks: one row per (document, offset), offsets at
    * `stride` spacing, each chunk `size` characters (the tail chunk may
    * be shorter). `stride < size` gives overlapping chunks; `stride ==
    * size` gives a partition. Offsets are 0-based and the chunk at
    * offset o covers characters [o, o+size). Empty/short documents yield
    * exactly one chunk at offset 0.
    */
  def charChunks(docs: DataFrame, textCol: String, size: Int, stride: Int): DataFrame = {
    require(size > 0, s"size must be > 0 (got $size)")
    require(stride > 0, s"stride must be > 0 (got $stride)")
    Seq("off", "chunk").foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — it would collide with the chunker's output"))
    val keep = docs.columns.filterNot(_ == textCol).map(col).toIndexedSeq
    docs
      .withColumn("off",
        explode(sequence(lit(0L), greatest(length(col(textCol)).cast("long") - 1L, lit(0L)),
          lit(stride.toLong))))
      .select(keep :+ col("off") :+
        col(textCol).substr((col("off") + 1L).cast("int"), lit(size)).as("chunk"): _*)
  }

  /** Sentence-window chunks (the RAG-ingest chunker): split the text
    * into SENTENCES, then emit overlapping windows of `perChunk`
    * sentences at `stride` spacing — boundaries land between sentences,
    * never mid-clause, and `stride < perChunk` carries cross-boundary
    * context exactly like [[charChunks]]'s character overlap.
    *
    * Sentence split is one extraction regex (terminator-run sentences
    * plus an unterminated tail; no lookbehind — RE2-safe, so the same
    * automaton runs in any engine), trimmed and de-blanked. Window
    * enumeration is pure integer arithmetic on the sentence index:
    * window c covers sentences [c·stride+1, min(c·stride+perChunk, n)],
    * c ∈ [0, ceil((n−perChunk)⁺/stride)] — the last window ends at n
    * and no window is a suffix of its predecessor. Docs with zero
    * sentences yield no chunks.
    *
    * Map-only like the other chunkers: regex + sequence + explode +
    * slice in one codegen'd pass, chunks inherit the input partitioning. */
  def sentenceChunks(docs: DataFrame, textCol: String, perChunk: Int = 4,
      stride: Int = 3): DataFrame = {
    require(perChunk > 0, s"perChunk must be > 0 (got $perChunk)")
    require(stride > 0 && stride <= perChunk,
      s"stride ($stride) must be in [1, perChunk=$perChunk]: stride 0 " +
        "never advances; stride > perChunk drops sentences between windows")
    Seq("sents", "n_sents", "chunk_id", "first_sent", "last_sent", "chunk")
      .foreach(c => require(!docs.columns.contains(c),
        s"input already has a '$c' column — it would collide with the chunker's output"))
    val keep = docs.columns.filterNot(_ == textCol).map(col).toIndexedSeq
    val sents = filter(
      transform(regexp_extract_all(col(textCol),
        lit("[^.!?]*[.!?]+|[^.!?]+$"), lit(0)), s => trim(s)),
      s => s =!= "")
    // ceil((n - perChunk)+ / stride) via exact small-int floor division
    val lastC = floor((greatest(col("n_sents") - perChunk, lit(0L))
      + (stride - 1)) / stride).cast("long")
    docs
      .select(keep :+ sents.as("sents"): _*)
      .withColumn("n_sents", size(col("sents")).cast("long"))
      .filter(col("n_sents") > 0L)
      .withColumn("chunk_id", explode(sequence(lit(0L), lastC)))
      .withColumn("first_sent", col("chunk_id") * stride + 1L)
      .withColumn("last_sent",
        least(col("chunk_id") * stride + perChunk, col("n_sents")))
      .select(keep ++ Seq(col("chunk_id"), col("first_sent"), col("last_sent"),
        array_join(slice(col("sents"), col("first_sent").cast("int"),
          (col("last_sent") - col("first_sent") + 1L).cast("int")), " ")
          .as("chunk")): _*)
  }

  /** Content-defined chunks (rolling gear hash — see
    * [[org.apache.spark.sql.graft.CdcExprs]]): boundaries follow the
    * CONTENT, so shared passages chunk identically wherever they sit
    * and an edit disturbs only the chunks it touches — the
    * dedup-friendly chunker (chunk-hash dedup over these catches
    * cross-document boilerplate that document fingerprints miss).
    * Expected chunk length ≈ 2^maskBits (bounded to [minLen, maxLen]).
    * One codegen'd pass per row, map-only like [[charChunks]]. Output:
    * one row per (doc, chunk_idx) with the chunk text. */
  def cdcChunks(docs: DataFrame, textCol: String, maskBits: Int = 6,
      minLen: Int = 16, maxLen: Int = 256): DataFrame = {
    Seq("chunk_idx", "chunk").foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — it would collide with the chunker's output"))
    val keep = docs.columns.filterNot(_ == textCol).map(col).toIndexedSeq
    val chunksCol = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.CdcChunksExpr(
        org.apache.spark.sql.graft.Bridge.expression(col(textCol)),
        maskBits, minLen, maxLen))
    docs
      .select(keep :+ posexplode(chunksCol).as(Seq("chunk_idx", "chunk")): _*)
  }
}
