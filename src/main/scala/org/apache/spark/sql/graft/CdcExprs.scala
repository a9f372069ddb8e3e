package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the FastCDC/gear-hash family): chunk
  * boundaries are a pure function of LOCAL content — a rolling gear
  * hash fires a boundary where `(h & mask) == 0` — so inserting or
  * editing text shifts only the chunks that overlap the edit, and
  * every later chunk re-aligns byte-for-byte. That is the property
  * fixed-stride chunking lacks (one inserted character shifts every
  * subsequent window) and what makes CDC the dedup-friendly chunker:
  * identical passages in different documents produce identical chunks
  * wherever they sit, so chunk-hash dedup (L1/L2 over chunks) catches
  * shared boilerplate that document-level fingerprints miss.
  *
  * Deterministic by construction: the gear table derives from
  * splitmix64 of the character byte, the hash is a pure fold, and
  * min/max bounds are enforced positionally (maxLen forces a cut, a
  * cut resets the hash) — the same text chunks identically on every
  * engine, partition, and retry.
  */
object CdcExprs {

  /** Gear table: splitmix64 finalizer of the byte value — public-domain
    * mixing constants, no RNG state. */
  val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Chunk `text` (as UTF-16 code units; boundaries never split a
    * surrogate pair) with boundaries where the gear hash masks to zero,
    * subject to [minLen, maxLen]. Returns the chunk array (concat ==
    * input). Empty input → one empty chunk. */
  def chunks(text: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      h = (h << 1) + Gear(c & 0xFF)
      val len = i - start + 1
      // never cut between a surrogate pair: defer the boundary one unit
      val splitsPair = Character.isHighSurrogate(c) && i + 1 < n &&
        Character.isLowSurrogate(s.charAt(i + 1))
      if (!splitsPair &&
          ((len >= minLen && (h & mask) == 0L) || len >= maxLen)) {
        out += UTF8String.fromString(s.substring(start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n || n == 0) out += UTF8String.fromString(s.substring(start))
    new GenericArrayData(out.toArray[Any])
  }
}

/** string → array<string> content-defined chunks. */
case class CdcChunksExpr(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maskBits >= 1 && maskBits <= 30, s"maskBits in [1,30] (got $maskBits)")
  require(minLen >= 1, s"minLen >= 1 (got $minLen)")
  require(maxLen > minLen, s"maxLen > minLen (got $maxLen <= $minLen)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"

  protected override def nullSafeEval(input: Any): Any =
    CdcExprs.chunks(input.asInstanceOf[UTF8String], maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CdcExprs.chunks($c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
