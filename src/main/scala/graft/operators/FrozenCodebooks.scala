package graft.operators

/** Frozen quantizer codebooks for the ORACLE-PINNED ANN queries
  * (l3c_ivf_pinned / l3e_pq_pinned / l3f_ivfadc_pinned): an IVF coarse
  * quantizer (8 centroids x 64 dims) and 4 PQ subquantizers (8 centroids
  * x 16 dims each), trained ONCE on the sf0.01 embeddings by
  * [[graft.tools.FreezeCodebooks]] and carried as literal DATA — the
  * SemanticHyperplanes / BPE-merge-table precedent. Training is
  * float-iterative and stays spec-verified; the SEARCH math (cell
  * assignment, nprobe pruning, PQ encode, LUT build, ADC scoring) is a
  * deterministic function of (vectors, codebook) and replays bit-exactly
  * in DuckDB against these same literals.
  *
  * Every coordinate is quantized to the dyadic grid k/1024, exactly
  * representable in BOTH float32 and float64: the engine's `k / 1024f`
  * and the oracle's `(k/1024.0)` denote the SAME real number, so there
  * is no decimal-parse drift between engines (the hazard a plain
  * Float.toString literal would reintroduce).
  */
object FrozenCodebooks {

  private val ivfRawQ: Array[Array[Int]] = Array(
    Array(45, 14, 37, 11, 65, 42, -73, 47, 6, -64, 94, -6, -44, -21, 10, 20, -38, 12, -36, -39, 69, 31, 33, -4, -31, -10, 6, 21, 26, 44, -23, -44, 27, 50, 4, 8, 3, 110, 49, 6, -27, -63, -10, 27, -43, 3, 20, 2, 51, -15, 70, -5, -57, -4, 4, 9, 3, 11, -13, 27, 73, -15, -25, 19),
    Array(-16, -1, -40, 18, -3, -11, 6, -52, -12, -70, -11, -46, -74, 43, -36, -34, -46, 5, 31, 22, -21, -31, 23, 35, 37, 25, -21, 19, -9, 0, 33, -39, -28, 5, 21, -59, -58, -3, -46, 57, -8, 16, 77, -21, 9, 36, 0, -31, 17, 85, -4, -6, 6, -18, -34, -30, 70, -20, 29, 61, -8, 9, 38, -5),
    Array(82, -28, -20, -54, 21, 19, 1, 4, -7, -57, 37, -61, -6, 15, -32, 9, 15, 112, -18, 40, -30, 35, 21, -53, -56, -37, 21, 23, -14, 5, -28, 22, 12, -35, 14, 72, 6, -29, 7, 26, 12, -47, 21, -27, 36, 3, -8, -7, 35, 11, -21, -13, 62, -51, 35, -11, -33, 13, 9, -35, -14, -1, -31, -10),
    Array(-57, -50, 64, 9, 3, 4, 9, 26, -21, 72, -1, 78, 26, -1, 44, 17, 17, -60, -19, 5, -12, -38, -39, 3, -32, 35, 2, 50, -17, -52, 10, -93, 36, -5, 24, 20, 5, -35, -45, -23, 57, -3, -5, 0, -15, -59, -48, -33, 11, 39, 14, 18, 74, 20, 9, -9, -23, 11, -19, -17, 31, 13, -40, -14),
    Array(-29, 55, 1, 16, -20, 35, -38, -13, -14, -46, -7, -4, -9, -30, -4, 3, 31, -22, 23, 1, -9, -18, 8, -9, 32, -74, 37, 10, 12, 2, 10, 41, -42, -53, -20, 6, 10, -19, -22, 7, 25, 8, 26, 18, -81, 29, 9, -3, -90, -2, -16, 28, -5, 11, 30, 32, 12, 34, -139, 8, -17, 13, 61, 5),
    Array(-30, -3, -11, -28, -4, 2, -40, 20, 13, 12, -16, 41, 59, -53, 57, -24, -15, 19, 57, -21, 25, 46, -15, -7, 40, 74, -12, -49, -17, 24, -5, 23, 0, -16, -20, -9, -61, -23, 11, -100, 46, -64, -15, 1, 10, 31, -19, 13, -5, -104, -16, -2, -14, -17, -33, 33, 41, -14, 51, 2, -24, 38, -39, -36),
    Array(-13, -4, -7, 6, -13, -33, 51, 44, -23, 49, 0, 54, -24, 43, -49, 10, 25, -7, -33, -1, -34, 2, 8, -11, 19, 46, -22, 21, 11, 42, 34, 24, 46, 14, -41, 38, 42, -9, 38, 22, -55, 50, -63, 20, -19, 12, 72, 41, -18, -60, 40, -8, -6, 14, -3, -28, -18, -72, -9, -64, 19, 7, -3, -7),
    Array(43, -16, 22, -7, 51, 19, -100, -8, 50, 90, -34, -45, 44, 15, 24, 52, 21, -27, -7, -5, 2, -17, -1, -8, -33, 44, -27, -7, 3, -75, 13, -8, 9, 0, 83, -100, -5, 27, -6, 0, -69, -7, -14, -24, 2, -29, -48, 60, -21, -15, 19, -27, -14, 16, 28, -24, 3, 35, 60, -27, -56, -32, 37, -61))

  /** The unit-vector coarse quantizer for the IVFADC path, which assigns
    * cells AFTER l2-normalization. [[graft.tools.FreezeCodebooks]] emits
    * `ivfRawQ` and `ivfUnitQ` as separate blocks; on the sf0.01
    * embeddings they quantize IDENTICALLY because that corpus is already
    * unit-norm (verified: the generator's two printed blocks coincide),
    * so the unit table aliases the raw one rather than duplicating 512
    * literals. If the training corpus ever stops being pre-normalized,
    * paste the generator's `ivfUnitQ` block here as its own array. */
  private val ivfUnitQ: Array[Array[Int]] = ivfRawQ

  private val pqQ: Array[Array[Array[Int]]] = Array(
    Array(
      Array(70, 1, -2, 17, 83, 86, -113, 48, 30, -20, 40, -17, 57, -4, -73, 140),
      Array(-5, -4, 81, 8, -1, -92, -34, 49, -19, 133, -39, -22, 91, -5, 67, 4),
      Array(-71, -39, -89, -102, 13, 74, 63, -51, 0, -10, 21, 15, -13, 167, 0, -48),
      Array(104, 6, -69, -11, 44, 22, -7, 35, 34, -76, 6, -37, 22, -47, 97, -128),
      Array(-52, -66, -14, 72, 32, 44, 17, 15, 16, 77, 55, 25, -135, -12, 56, -30),
      Array(9, 126, 33, -17, -26, 60, 20, 21, 1, 27, -74, 151, -19, -13, -44, 23),
      Array(28, -25, 25, 8, 41, -78, -52, -115, -22, -104, -10, 5, -17, 59, -22, 79),
      Array(-57, -20, 14, -50, -96, 7, -14, 65, -45, -66, 55, -72, -13, -92, -86, -26)),
    Array(
      Array(-27, 4, -8, -10, 49, -8, -63, 6, 129, -3, 34, 66, 45, 114, 49, -40),
      Array(17, 123, 13, -72, -1, 16, 105, -181, -29, -84, 41, -10, -37, 0, -16, 6),
      Array(44, 59, -7, -62, -107, 22, 25, 77, -13, 18, -43, -5, -9, -81, 135, -40),
      Array(18, -120, -94, 1, -6, -24, 22, -28, 71, 62, -25, 12, -19, -65, -11, 76),
      Array(-50, -5, 69, 26, 71, 48, 28, 6, -37, -3, -86, -91, 26, 32, -9, 26),
      Array(-31, 60, 40, 55, 2, -74, 6, 4, -49, 52, -39, 57, -132, 20, -76, -107),
      Array(-59, -70, -4, -22, -54, 107, 28, 44, -25, 143, 135, -16, 9, 39, 23, -11),
      Array(90, 27, 1, 67, -20, -44, -90, 11, -76, -46, 15, 76, 71, -36, -32, -1)),
    Array(
      Array(16, -33, -48, 21, 39, -102, -109, -36, 104, -16, 56, -33, -50, 15, -60, 8),
      Array(-5, -47, 89, 9, -143, -64, 86, 56, 33, -79, 28, -1, -100, 22, -1, 38),
      Array(84, 65, 36, 63, 8, 40, -10, -27, -40, -113, -19, 56, 13, 54, 47, 9),
      Array(-126, 32, -31, -61, -84, 94, -60, -17, -61, -53, 47, 46, -47, 33, -61, -7),
      Array(-19, -1, 96, -109, 42, -48, -91, -13, -33, 30, -57, -19, 63, -14, -10, -16),
      Array(39, -85, -65, 39, 79, 57, 23, 38, 11, 50, -30, 59, -84, 2, 101, -84),
      Array(-8, -17, 18, 122, -16, -1, 60, 22, -54, 38, -25, -79, 9, -110, -63, 60),
      Array(57, 13, -46, -127, -15, -12, 114, -19, 48, 54, 23, -46, 86, 37, 28, 48)),
    Array(
      Array(18, 0, -72, -68, 36, 43, 51, 13, -93, 4, -60, -2, 26, 71, 25, 19),
      Array(-31, 49, -11, 56, -83, 14, -84, -121, 68, -48, -8, 48, -25, 44, -62, -41),
      Array(-8, -15, 46, 105, 23, -24, 8, 96, 16, 89, -6, -135, 123, -10, -72, -108),
      Array(108, -72, 78, -50, -13, 25, -9, 28, 35, 62, -11, 14, -20, -84, 1, 88),
      Array(-24, -48, 18, -90, 73, -3, -28, -62, 4, 70, 122, -14, -58, 88, -82, -44),
      Array(-31, -17, -77, 53, 26, -117, -33, 16, 13, -62, -55, -108, -33, 43, 20, 56),
      Array(-55, -72, 21, 67, -55, -4, 89, -9, -18, -20, 54, 64, -35, -44, 113, -36),
      Array(-18, 87, 87, -8, 43, 13, 17, 33, 42, -67, -63, -2, 67, -64, -8, -90)))

  /** The engine-side codebooks (exact dyadic floats): the raw-vector
    * coarse quantizer feeds l3c's IVF over unnormalized embeddings, the
    * unit-vector one feeds l3f's IVFADC (cells assigned post-l2norm). */
  val IvfRawCentroids: Array[Array[Float]] = ivfRawQ.map(_.map(_ / 1024f))
  val IvfUnitCentroids: Array[Array[Float]] = ivfUnitQ.map(_.map(_ / 1024f))
  val PqCodebooks: Array[Array[Array[Float]]] = pqQ.map(_.map(_.map(_ / 1024f)))

  /** The oracle-side literals: the SAME dyadic values as exact DuckDB
    * DOUBLE expressions (integer / 1024.0 is an exact binary operation,
    * never a decimal parse). */
  private def sqlLits(q: Array[Array[Int]]): IndexedSeq[IndexedSeq[String]] =
    q.map(_.map(k => s"($k/1024.0)").toIndexedSeq).toIndexedSeq
  val IvfRawSqlLiterals: IndexedSeq[IndexedSeq[String]] = sqlLits(ivfRawQ)
  val IvfUnitSqlLiterals: IndexedSeq[IndexedSeq[String]] = sqlLits(ivfUnitQ)
  val PqSqlLiterals: IndexedSeq[IndexedSeq[IndexedSeq[String]]] =
    pqQ.map(_.map(_.map(k => s"($k/1024.0)").toIndexedSeq).toIndexedSeq).toIndexedSeq
}
