package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-sketch expressions (public Column API + rationale in
  * graft.functions.TextFunctions). In the sql package namespace because
  * ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4.
  */
object TextExprs {

  /** Identical value semantics to TextFunctions.md5Hash60(s, seed):
    * first 15 hex chars of md5("seed:" + s) parsed base-16 → 60-bit long.
    * The DuckDB oracle replays it as
    * ('0x' || substr(md5(seed||':'||s), 1, 15))::BIGINT. */
  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Seed prefixes ("0:", "1:", …) cached as bytes: the multi-seed
    * MinHash loop calls md5Hash60 numHashes times per shingle, and the
    * per-call `(seed + ":").getBytes` alloc dominated the digest cost. */
  private val seedPrefixCache: Array[Array[Byte]] =
    Array.tabulate(64)(j => (j.toString + ":").getBytes("UTF-8"))
  def seedPrefix(seed: Int): Array[Byte] =
    if (seed < 64) seedPrefixCache(seed) else (seed.toString + ":").getBytes("UTF-8")

  /** First 60 bits (15 hex chars) of the digest in `buf`. */
  @inline private def first60(buf: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (buf(i) & 0xffL); i += 1 }
    (v << 4) | ((buf(7) & 0xf0L) >> 4)
  }

  /** Allocation-free core: digest(prefix ++ s) into the caller's 16-byte
    * buffer. Value-identical to md5Hash60(seed, s) when prefix =
    * seedPrefix(seed) and sBytes = s.getBytes. */
  def md5Hash60Into(md: MessageDigest, prefix: Array[Byte],
      sBytes: Array[Byte], out: Array[Byte]): Long = {
    md.reset()
    md.update(prefix)
    md.update(sBytes)
    md.digest(out, 0, 16)
    first60(out)
  }

  def md5Digest: MessageDigest = localMd5.get()

  def md5Hash60(seed: Int, s: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    md.update(seedPrefix(seed))
    val digest = md.digest(s.getBytes)
    // first 15 hex chars = 60 bits: 7.5 bytes
    first60(digest)
  }

  /** Shared finalizer mix for the xx/long MinHash families. The two
    * families MUST stay bit-identical (LongMinHashSigExpr over
    * HashedShinglesExpr equals XxMinHashSigExpr over string shingles)
    * — one definition makes divergence impossible. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** 60-bit SimHash over a token array, single pass, native.
  *
  * Per token: md5Hash60(0, token); per bit i∈[0,60): +1 if set else −1;
  * sketch bit i = sign of the sum. One md5 per token (the pure-Column
  * formulation re-evaluated the token-hash array once per bit — 60×).
  */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash60"

  protected override def nullSafeEval(input: Any): Any =
    SimHash60Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHash60Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60Expr {
  /** Single implementation — interpreted eval and codegen both call it. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](60)
    val md = TextExprs.md5Digest
    val buf = new Array[Byte](16)
    val prefix = TextExprs.seedPrefix(0)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = TextExprs.md5Hash60Into(md, prefix,
          arr.getUTF8String(t).getBytes, buf)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sk = 0L
    var i = 0
    while (i < 60) { if (sums(i) > 0) sk |= (1L << i); i += 1 }
    sk
  }
}

/** |A ∩ B| for two SORTED long arrays (merge count, no hashing, no
  * allocation beyond the primitive copies). Jaccard over hashed shingle
  * or n-gram sets is i / (|A| + |B| − i) — one of these per pair instead
  * of an array_intersect hash-set build. */
case class SortedLongIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SortedLongIntersectCountExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCountExpr {
  def compute(ad: ArrayData, bd: ArrayData): Long = {
    val a = ad.toLongArray()
    val b = bd.toLongArray()
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** One-pass MinHash signature, md5 family — value-identical to
  * `array((0 until k).map(seed => array_min(transform(sh, s =>
  * md5Hash60(s, seed)))))` but with ONE expression-tree evaluation of
  * the shingle array and no per-seed intermediate arrays. The Column
  * formulation paid ~80µs per hash in md5→hex→substr→conv string
  * round-trips; this computes the 60-bit value straight from the digest
  * bytes. Empty input → all-null signature (array_min-of-empty parity).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_md5"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // hoisted per-row state: one digest buffer, one byte copy per
    // shingle, cached seed prefixes — the naive per-(shingle, seed)
    // md5Hash60 call paid 3 allocations per hash, ~2× the digest itself
    val md = TextExprs.md5Digest
    val out = new Array[Byte](16)
    var any = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        val sBytes = arr.getUTF8String(t).getBytes
        var j = 0
        while (j < numHashes) {
          val h = TextExprs.md5Hash60Into(md, TextExprs.seedPrefix(j), sBytes, out)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}

/** MinHash signature, md5 PAIRED-digest family: one md5 digest yields
  * TWO independent 60-bit hashes (hex chars 1-15 and 16-30), so
  * `numHashes` hashes cost ceil(numHashes/2) digests — the md5 family's
  * replayability at half its compute. Hash 2d   = first60 of
  * md5(d ":" s); hash 2d+1 = next60 of the SAME digest. DuckDB replay:
  *   even j: ('0x' || substr(md5((j/2)||':'||s),  1, 15))::BIGINT
  *   odd  j: ('0x' || substr(md5((j/2)||':'||s), 16, 15))::BIGINT
  * Same empty→nulls contract as MinHashSigExpr.
  */
case class MinHashSigPairedExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_md5_paired"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigPairedExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSigPairedExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigPairedExpr {
  /** Hex chars 16-30 of the digest: low nibble of byte 7, bytes 8-14. */
  @inline private def next60(buf: Array[Byte]): Long = {
    var v = (buf(7) & 0x0fL)
    var i = 8
    while (i < 15) { v = (v << 8) | (buf(i) & 0xffL); i += 1 }
    v
  }

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val digests = (numHashes + 1) / 2
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = TextExprs.md5Digest
    val out = new Array[Byte](16)
    var any = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        val sBytes = arr.getUTF8String(t).getBytes
        var d = 0
        while (d < digests) {
          md.reset()
          md.update(TextExprs.seedPrefix(d))
          md.update(sBytes)
          md.digest(out, 0, 16)
          var v = 0L
          var i = 0
          while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
          val h0 = (v << 4) | ((out(7) & 0xf0L) >> 4)
          if (h0 < mins(2 * d)) mins(2 * d) = h0
          if (2 * d + 1 < numHashes) {
            val h1 = next60(out)
            if (h1 < mins(2 * d + 1)) mins(2 * d + 1) = h1
          }
          d += 1
        }
      }
      t += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}

/** One-pass MinHash signature, md5×multiply family — the FAST
  * oracle-replayable path. Per shingle: ONE md5 (60-bit base =
  * DuckDB's `('0x' || substr(md5(x), 1, 15))::BIGINT`, so the base is
  * engine-replayable by construction), then `numHashes` wrapping
  * multiplies by fixed odd constants — Java's native long-wrap
  * semantics, which DuckDB reproduces exactly as
  * `((h::HUGEINT * a) % 2^64 + 2^64 + 2^63) % 2^64 - 2^63`. This
  * replaces the paired-digest family's ceil(numHashes/2) md5 calls
  * per shingle with ONE — the whole remix ladder costs `numHashes`
  * multiplies — while keeping the full banded pipeline (signature,
  * band membership, candidate set) oracle-checkable. Multiply-mod-2^64
  * by a random odd constant is the classic multiplicative family:
  * per-hash signature agreement tracks jaccard (validated at
  * j∈{.3,.5,.7,.9} within ±0.02), which is all banded LSH needs. */
case class MinHashSigMulExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1 && numHashes <= 64,
    s"numHashes in [1,64] (got $numHashes): the mixer table is 64 long")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_md5_mul"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigMulExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSigMulExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigMulExpr {
  /** Odd 64-bit mixers, one per hash: splitmix64(j) | 1. Public so the
    * DuckDB twin interpolates the SAME constants as literals. */
  val Mixers: Array[Long] = Array.tabulate(64)(j => TextExprs.splitmix64(j.toLong) | 1L)

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = TextExprs.md5Digest
    val out = new Array[Byte](16)
    var any = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        md.reset()
        md.update(arr.getUTF8String(t).getBytes)
        md.digest(out, 0, 16)
        // first 15 hex chars of the digest — replayable 60-bit base
        var v = 0L
        var i = 0
        while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
        val base = (v << 4) | ((out(7) & 0xf0L) >> 4)
        var j = 0
        while (j < numHashes) {
          val h = base * Mixers(j) // Java long wrap == the oracle's HUGEINT-mod
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}

/** [[MinHashSigMulExpr]] computed STRAIGHT FROM THE LOWERED TEXT — the
  * k-char windows walk the UTF-8 bytes with the HashedShinglesExpr
  * ring (char-aligned starts), each window md5s through one reused
  * scratch buffer, and no shingle string array ever materializes.
  * Value-identical to MinHashSigMulExpr over the string shingle list
  * (same bytes reach md5; duplicate windows cannot change a min), so
  * the DuckDB twin is unchanged. This is what makes the
  * oracle-replayable family track the xx scale path's cost: the
  * paired/mul-over-strings formulations spent their time allocating
  * the shingle substrings, not hashing. Empty/too-short text (< k
  * chars, no window) → all-null signature, same contract as the other
  * families. */
case class MinHashSigMulTextExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"shingle size must be >= 1 (got $k)")
  require(numHashes >= 1 && numHashes <= 64,
    s"numHashes in [1,64] (got $numHashes): the mixer table is 64 long")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_md5_mul_text"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigMulTextExpr.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSigMulTextExpr.compute($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigMulTextExpr {
  def compute(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val numBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val ring = new Array[Int](k + 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = TextExprs.md5Digest
    val out = new Array[Byte](16)
    var scratch = new Array[Byte](k * 4 + 8)
    val mixers = MinHashSigMulExpr.Mixers
    var any = false
    var pos = 0
    var c = 0
    while (pos < numBytes) {
      ring(c % (k + 1)) = pos
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + pos)
      pos += UTF8String.numBytesForFirstByte(b)
      if (pos > numBytes) pos = numBytes // clamp malformed trailing char
      if (c >= k - 1) {
        any = true
        val start = ring((c - k + 1) % (k + 1))
        val len = pos - start
        if (len > scratch.length) scratch = new Array[Byte](len * 2)
        org.apache.spark.unsafe.Platform.copyMemory(base, off + start,
          scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
        md.reset()
        md.update(scratch, 0, len)
        md.digest(out, 0, 16)
        var v = 0L
        var i = 0
        while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
        val h60 = (v << 4) | ((out(7) & 0xf0L) >> 4)
        var j = 0
        while (j < numHashes) {
          val h = h60 * mixers(j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      c += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}

/** One-pass MinHash signature, xxhash family — the LSH scale path (no
  * oracle twin; self-consistent hashing is all LSH needs). Per shingle:
  * one xxhash64 of the bytes, then `numHashes` splitmix64 remixes — vs
  * the Column formulation's k full string hashes and k array passes.
  */
case class XxMinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_xx"

  protected override def nullSafeEval(input: Any): Any =
    XxMinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.XxMinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XxMinHashSigExpr {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        val s = arr.getUTF8String(t)
        val base = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        val base64 = (base.toLong << 32) ^ (s.numBytes.toLong * 0x9e3779b97f4a7c15L)
        var j = 0
        while (j < numHashes) {
          val h = TextExprs.splitmix64(base64 ^ (j.toLong * 0xc2b2ae3d27d4eb4fL))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}

/** Random-hyperplane LSH bucket id over array<float> — native loop.
  * The Column formulation folded bits×dim element_at/when nodes into one
  * ~512-node expression tree: Janino spends seconds compiling it and the
  * result overflows inlining budgets. Hyperplane component (b,d) is a
  * fixed xorshift mix of the indices — deterministic everywhere, no
  * broadcast needed (identical to VectorFunctions.rhpBucket's original
  * definition).
  */
case class RhpBucketExpr(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rhp_bucket"

  // hyperplane table precomputed ONCE per expression instance: comp()
  // is ~8 long ops + a modulo + a division — recomputing it bits*dim
  // times per row wasted ~10^13 mixes on a 10^9-row corpus
  @transient private lazy val table: Array[Array[Double]] =
    Array.tabulate(bits, dim)(RhpBucketExpr.comp)

  protected override def nullSafeEval(input: Any): Any =
    RhpBucketExpr.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("rhpTable", table, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RhpBucketExpr.compute($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBucketExpr {
  /** The mix's RATIONAL numerator (|k| < 2^21): exposed so the DuckDB
    * oracle (AnnPinnedOracle.LshPinnedSql) can emit the hyperplane
    * table as exact `k/1000003.0` literals — the same correctly-rounded
    * IEEE division both engines perform, zero decimal-parse drift. */
  def compNumerator(b: Int, d: Int): Long = {
    var x = b.toLong * 1315423911L + d.toLong * 2654435761L + 104729L
    x ^= (x << 13); x ^= (x >>> 7); x ^= (x << 17)
    x % 1000003L
  }

  /** Hyperplane component in (-1, 1): xorshift mix of (bit, dim). */
  def comp(b: Int, d: Int): Double = compNumerator(b, d).toDouble / 1000003.0

  def compute(arr: ArrayData, table: Array[Array[Double]]): Int = {
    var bucket = 0
    var b = 0
    while (b < table.length) {
      val row = table(b)
      val n = math.min(arr.numElements(), row.length)
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) proj += arr.getFloat(d).toDouble * row(d)
        d += 1
      }
      if (proj > 0.0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}

/** Nearest-centroid cell assignment over array<float> — the IVF coarse
  * quantizer's map side. Centroids are embedded in the expression (a
  * coarse quantizer is nlist×dim floats — kilobytes), so assignment is
  * a codegen'd primitive loop with no broadcast machinery or per-row
  * allocation. */
case class CellAssignExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ivf_cell"

  protected override def nullSafeEval(input: Any): Any =
    CellAssignExpr.compute(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CellAssignExpr.compute($c, $cRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellAssignExpr {
  def compute(arr: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      val n = math.min(arr.numElements(), ct.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        // skip null elements (same semantics as RhpBucketExpr) rather
        // than toFloatArray's silent null-as-0.0 read
        if (!arr.isNullAt(i)) {
          val diff = arr.getFloat(i).toDouble - ct(i).toDouble
          d += diff * diff
        }
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }
}

/** Unsigned byte read at a 1-based offset of a binary column — the
  * frame parser's field-extraction primitive (S2). The pure-Column
  * form conv(hex(substring(bin, off, 1)), 16, 10) round-trips every
  * byte through TWO string materializations and a base-16 parse; this
  * is one bounds-checked array read. Returns -1 when the frame is
  * shorter than the offset (callers' range predicates then reject the
  * row, matching the reference's treatment of truncated frames). */
case class ByteAtExpr(child: Expression, offset1: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_byte_at"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val i = offset1 - 1
    if (i < 0 || i >= b.length) -1 else b(i) & 0xff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(($offset1 - 1 < 0 || $offset1 - 1 >= $c.length) ? -1 : ($c[$offset1 - 1] & 0xff))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct xx-hashed char k-shingles of an (already-lowered)
  * string — the string-free shingle path for LSH/verification
  * (SURVEY §2.10 L2). The Column formulation
  * (array_distinct(transform(sequence…, substring…))) materializes one
  * UTF8String PER CHARACTER POSITION (~n_chars heap strings per doc)
  * before hashing them; this walks the UTF-8 bytes once, hashing each
  * k-char window in place (char-boundary ring buffer — multibyte
  * safe), and returns the sorted distinct 64-bit hashes. Jaccard over
  * these sets equals Jaccard over the string sets (any injective-ish
  * hash preserves intersections; 64-bit collisions ≈ n²/2⁶⁴), and a
  * MinHash signature derives from them via LongMinHashSigExpr without
  * touching strings again. */
case class HashedShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"shingle size must be >= 1 (got $k)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hashed_shingles"

  protected override def nullSafeEval(input: Any): Any =
    HashedShinglesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HashedShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShinglesExpr {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val numBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // ring of the last k+1 char-start byte offsets; shingle c-k+1..c
    // spans [ring((c-k+1) % (k+1)), nextPos)
    val ring = new Array[Int](k + 1)
    var out = new Array[Long](math.max(16, math.min(numBytes, 1 << 12)))
    var outN = 0
    var pos = 0
    var c = 0
    while (pos < numBytes) {
      ring(c % (k + 1)) = pos
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + pos)
      pos += UTF8String.numBytesForFirstByte(b)
      if (pos > numBytes) pos = numBytes // clamp malformed trailing char
      if (c >= k - 1) {
        val start = ring((c - k + 1) % (k + 1))
        val len = pos - start
        // IDENTICAL per-shingle base hash to XxMinHashSigExpr, so
        // LongMinHashSigExpr(sig) over these equals XxMinHashSigExpr
        // over the string shingles — same LSH banding behavior
        val m32 = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(base, off + start, len, 42)
        val base64 = (m32.toLong << 32) ^ (len.toLong * 0x9e3779b97f4a7c15L)
        if (outN == out.length) out = java.util.Arrays.copyOf(out, outN * 2)
        out(outN) = base64
        outN += 1
      }
      c += 1
    }
    java.util.Arrays.sort(out, 0, outN)
    var w = 0
    var i = 0
    while (i < outN) {
      if (w == 0 || out(w - 1) != out(i)) { out(w) = out(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOfRange(out, 0, w))
  }
}

/** MinHash signature over an ALREADY-HASHED shingle set (array<long>,
  * e.g. HashedShinglesExpr output): `numHashes` splitmix64 remixes per
  * element, no string hashing at all. Same empty-input contract as the
  * string variants (all-null signature). Self-consistent hashing is all
  * LSH banding needs — no oracle twin. */
case class LongMinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_long"

  protected override def nullSafeEval(input: Any): Any =
    LongMinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.LongMinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongMinHashSigExpr {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        val e = arr.getLong(t)
        var j = 0
        while (j < numHashes) {
          val h = TextExprs.splitmix64(e ^ (j.toLong * 0xc2b2ae3d27d4eb4fL))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](numHashes)(null))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        mins.map(Long.box(_): Any))
  }
}
