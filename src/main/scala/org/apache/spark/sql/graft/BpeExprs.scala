package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table BPE state shared by interpreted eval and codegen: the
  * compiled pre-tokenizer, the ranked merge rules, and a per-thread LRU
  * over distinct units (pre-tokenizer units are heavy-tailed, so the
  * cache turns per-row merging into a vocab-sized cost).
  *
  * SEMANTICS (and why they replay in SQL): per pre-tokenizer unit, the
  * symbol sequence starts as characters; ranks apply in ONE increasing
  * sweep, each rank as a single left-to-right non-overlapping pass.
  * Two structural properties make this exactly byte-pair encoding and
  * exactly the DuckDB recursive-CTE replay (iterated
  * `replace(seq, ' a b ', ' ab ')` on the space-joined sequence):
  *   1. merge operands exist before their rank (BPE training creates a
  *      symbol only at its own step), so applying rank r never creates
  *      a redex of rank q < r — one increasing sweep ≡ best-rank-first;
  *   2. rules have DISTINCT symbols a ≠ b (BpeTrain skips self-pairs),
  *      so (a,b) redexes never overlap — the rewrite is confluent, one
  *      pass per rank reaches the rank's fixpoint, and every merge
  *      strategy (array pass, iterated string replace) agrees.
  */
final class BpeState(val mergesA: Array[String], val mergesB: Array[String],
    patternStr: String) extends Serializable {
  require(mergesA.length == mergesB.length, "merge arrays must align")
  require(mergesA.indices.forall(i => mergesA(i) != mergesB(i)),
    "merge rules must have distinct symbols (a != b) — self-pairs break " +
      "confluence of the left-to-right pass (see BpeTrain)")

  @transient private lazy val pattern = java.util.regex.Pattern.compile(patternStr)

  @transient private lazy val cache =
    new ThreadLocal[java.util.LinkedHashMap[String, Integer]] {
      override def initialValue(): java.util.LinkedHashMap[String, Integer] =
        new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Integer]): Boolean = size() > 16384
        }
    }

  /** Token count of one unit after all merges (cached per distinct unit). */
  def unitLen(u: String): Int = {
    val c = cache.get()
    val hit = c.get(u)
    if (hit != null) return hit.intValue()
    val n = computeUnitLen(u)
    c.put(u, Integer.valueOf(n))
    n
  }

  private def computeUnitLen(u: String): Int = {
    var syms = new Array[String](u.length)
    var i = 0
    while (i < u.length) { syms(i) = String.valueOf(u.charAt(i)); i += 1 }
    var len = u.length
    var r = 0
    while (r < mergesA.length && len > 1) {
      val a = mergesA(r); val b = mergesB(r)
      // one left-to-right non-overlapping pass (sufficient: a != b)
      var read = 0; var write = 0
      while (read < len) {
        if (read < len - 1 && syms(read) == a && syms(read + 1) == b) {
          syms(write) = a + b; read += 2
        } else { syms(write) = syms(read); read += 1 }
        write += 1
      }
      len = write
      r += 1
    }
    len
  }

  /** Merged-BPE token count of a whole text: pre-tokenize, sum units. */
  def count(s: UTF8String): Long = {
    val m = pattern.matcher(s.toString)
    var total = 0L
    while (m.find()) total += unitLen(m.group())
    total
  }

  @transient private lazy val seqCache =
    new ThreadLocal[java.util.LinkedHashMap[String, String]] {
      override def initialValue(): java.util.LinkedHashMap[String, String] =
        new java.util.LinkedHashMap[String, String](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, String]): Boolean = size() > 16384
        }
    }

  /** Space-joined merged symbol sequence of one unit (cached per
    * distinct unit, like [[unitLen]] — same heavy-tail rationale). */
  private def unitSeq(u: String): String = {
    val c = seqCache.get()
    val hit = c.get(u)
    if (hit != null) return hit
    val syms = new Array[String](u.length)
    var i = 0
    while (i < u.length) { syms(i) = String.valueOf(u.charAt(i)); i += 1 }
    var len = u.length
    var r = 0
    while (r < mergesA.length && len > 1) {
      val a = mergesA(r); val b = mergesB(r)
      var read = 0; var write = 0
      while (read < len) {
        if (read < len - 1 && syms(read) == a && syms(read + 1) == b) {
          syms(write) = a + b; read += 2
        } else { syms(write) = syms(read); read += 1 }
        write += 1
      }
      len = write
      r += 1
    }
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < len) { if (i > 0) sb.append(' '); sb.append(syms(i)); i += 1 }
    val s = sb.toString
    c.put(u, s)
    s
  }

  /** Merged-BPE token SEQUENCE of a whole text, space-joined (the
    * tokenizer's apply step — [[count]] is its length). Empty/unit-free
    * text encodes to the empty string. */
  def encode(s: UTF8String): UTF8String = {
    val m = pattern.matcher(s.toString)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      if (sb.length > 0) sb.append(' ')
      sb.append(unitSeq(m.group()))
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Merged-BPE token count over a text column — LongType, codegen'd via a
  * referenced [[BpeState]]. NULL-intolerant like the other text exprs. */
case class BpeMergedCountExpr(child: Expression, mergesA: Seq[String],
    mergesB: Seq[String], patternStr: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_merged_count"

  @transient private lazy val state =
    new BpeState(mergesA.toArray, mergesB.toArray, patternStr)

  protected override def nullSafeEval(input: Any): Any =
    state.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeState", state,
      classOf[BpeState].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merged-BPE token sequence over a text column, space-joined —
  * StringType, codegen'd; the tokenizer's APPLY step where
  * [[BpeMergedCountExpr]] is its cardinality. Shares [[BpeState]]'s
  * semantics, so the same recursive-CTE oracle replays it (the CTE's
  * per-unit fixpoint `seq` IS this value, unit-concatenated). */
case class BpeEncodeExpr(child: Expression, mergesA: Seq[String],
    mergesB: Seq[String], patternStr: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val state =
    new BpeState(mergesA.toArray, mergesB.toArray, patternStr)

  protected override def nullSafeEval(input: Any): Any =
    state.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeState", state,
      classOf[BpeState].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
