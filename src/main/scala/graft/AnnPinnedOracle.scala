package graft

import graft.operators.FrozenCodebooks

/** DuckDB replay of the ANN SEARCH path on [[FrozenCodebooks]]' literal
  * quantizers — the oracle half of l3c_ivf_pinned / l3e_pq_pinned /
  * l3f_ivfadc_pinned.
  *
  * Bit-exactness argument (the l2p / l3d precedent): every distance is a
  * LEFT-TO-RIGHT chain of IEEE-754 double ops over values both engines
  * hold exactly — embedding floats widen exactly to double, codebook
  * coordinates are dyadic k/1024 literals ([[FrozenCodebooks]]), `a + b
  * + c` parses left-associated in both SQL and Column trees, sqrt and /
  * are correctly rounded, and `::FLOAT` is the same round-to-nearest-even
  * narrowing as Java's `(float)`. So cell assignments, PQ codes, LUT
  * entries and ADC sums agree to the last bit, argmin/rank ties break on
  * the same explicit (dist, index) order, and the only rounding at the
  * edge is the shared `round(x, 4)` display idiom.
  */
object AnnPinnedOracle {

  /** l3b — the LSH rung's oracle (VERDICT r11 #4). The engine's
    * "random" hyperplanes are a DETERMINISTIC xorshift mix
    * (RhpBucketExpr.comp), so no freezing is needed: the 8×64 table is
    * emitted as exact rational literals k/1000003.0 (the numerator
    * < 2^21 widens exactly; the division is one correctly-rounded IEEE
    * op in both engines), each projection replays as the engine's own
    * left-to-right double chain, and sign-bit banding plus 1-bit
    * multiprobe are pure integer arithmetic. Scoring reuses the
    * l3_cosine_topk idiom (round 4). */
  val LshPinnedSql: String = {
    val bits = 8
    val dim = 64
    val hpRows = (0 until bits).map { b =>
      val comps = (0 until dim).map { d =>
        s"${org.apache.spark.sql.graft.RhpBucketExpr.compNumerator(b, d)}/1000003.0"
      }
      s"($b, [${comps.mkString(", ")}])"
    }
    val proj = (1 to dim).map(i => s"e[$i]::DOUBLE*plane[$i]").mkString(" + ")
    s"""WITH hp(b, plane) AS (VALUES ${hpRows.mkString(", ")}),
       |q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cid, embedding AS e FROM embeddings WHERE vec_id >= 5),
       |cbk AS (SELECT cid, e,
       |  sum(CASE WHEN ($proj) > 0 THEN (1 << b) ELSE 0 END)::INT AS bucket
       |  FROM c CROSS JOIN hp GROUP BY cid, e),
       |qbk AS (SELECT qid, e,
       |  sum(CASE WHEN ($proj) > 0 THEN (1 << b) ELSE 0 END)::INT AS b0
       |  FROM q CROSS JOIN hp GROUP BY qid, e),
       |probes AS (SELECT qid, e, b0 AS bucket FROM qbk
       |  UNION ALL
       |  SELECT qid, e, xor(b0::BIGINT, (1::BIGINT << i))::INT AS bucket
       |  FROM qbk CROSS JOIN range(0, $bits) t(i)),
       |scored AS (SELECT p.qid, k.cid,
       |  round(list_cosine_similarity(p.e::DOUBLE[], k.e::DOUBLE[]), 4) AS sim
       |  FROM probes p JOIN cbk k USING (bucket))
       |SELECT qid, cid, sim FROM (SELECT qid, cid, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
       |  FROM scored) WHERE rn <= 3
       |ORDER BY qid, sim DESC, cid""".stripMargin
  }


  private val Dim = 64
  private val SubDim = 16 // Dim / m with m = 4 subquantizers

  /** `cb(cell, ctr)` — an IVF centroid table as exact-double literals:
    * the raw-trained quantizer for l3c (cells over raw vectors), the
    * unit-trained one for l3f (cells over l2-normalized vectors). */
  private def ivfCte(lits: IndexedSeq[IndexedSeq[String]]): String = {
    val rows = lits.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(", ")}])"
    }
    s"cb(cell, ctr) AS (VALUES ${rows.mkString(", ")})"
  }
  private val IvfRawCte = ivfCte(FrozenCodebooks.IvfRawSqlLiterals)
  private val IvfUnitCte = ivfCte(FrozenCodebooks.IvfUnitSqlLiterals)

  /** `pq(s, j, ctr)` — the PQ codebook table (m·k rows). */
  private val PqCte: String = {
    val rows = for {
      (cbk, s) <- FrozenCodebooks.PqSqlLiterals.zipWithIndex
      (c, j) <- cbk.zipWithIndex
    } yield s"($s, $j, [${c.mkString(", ")}])"
    s"pq(s, j, ctr) AS (VALUES ${rows.mkString(", ")})"
  }

  /** Σᵢ (v[i] − ctr[i])² — CellAssignExpr's accumulation order. */
  private def assignDist(v: String, c: String): String =
    (1 to Dim).map(i => s"($v[$i]::DOUBLE - $c[$i])*($v[$i]::DOUBLE - $c[$i])")
      .mkString(" + ")

  /** Σᵢ over one SUBSPACE: (v[s·16+i] − ctr[i])² — PqExprs.subCode/lut. */
  private def subDist(v: String, c: String): String =
    (1 to SubDim).map(i =>
        s"($v[s*$SubDim+$i]::DOUBLE - $c[$i])*($v[s*$SubDim+$i]::DOUBLE - $c[$i])")
      .mkString(" + ")

  private def dotVV(v: String): String =
    (1 to Dim).map(i => s"$v[$i]::DOUBLE*$v[$i]::DOUBLE").mkString(" + ")
  private def dotVC(v: String, c: String): String =
    (1 to Dim).map(i => s"$v[$i]::DOUBLE*$c[$i]").mkString(" + ")
  private def dotCC(c: String): String =
    (1 to Dim).map(i => s"$c[$i]*$c[$i]").mkString(" + ")

  /** ‖q‖² − 2·q·c + ‖c‖² — the probe-ranking distance, in the engine's
    * exact dot-then-combine order (NOT the same float result as
    * [[assignDist]]'s diff-and-square, so each path replays its own). */
  private def probeDist(v: String, c: String): String =
    s"(${dotVV(v)}) - 2.0*(${dotVC(v, c)}) + (${dotCC(c)})"

  /** Unit-normalized float vectors: n2 in array order, one shared inv,
    * per-element double-multiply narrowed back to float — exactly
    * PqExprs.l2normalize. */
  private val NormCte: String = {
    val n2 = (1 to Dim).map(i => s"e[$i]::DOUBLE*e[$i]::DOUBLE").mkString(" + ")
    val elems = (1 to Dim).map(i => s"(e[$i]::DOUBLE*inv)::FLOAT").mkString(", ")
    s"""n0 AS (SELECT vec_id, embedding AS e, (1.0/sqrt($n2)) AS inv FROM embeddings),
       |nv AS (SELECT vec_id, [$elems] AS v FROM n0)""".stripMargin
  }

  /** l3c — IVF on RAW vectors: literal-centroid cell assignment, nprobe
    * pruning by the dot-form distance, exact cosine inside probed cells. */
  val IvfPinnedSql: String =
    s"""WITH $IvfRawCte,
       |q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cid, embedding AS e FROM embeddings WHERE vec_id >= 5),
       |ad AS (SELECT cid, cell, (${assignDist("e", "ctr")}) AS dist FROM c CROSS JOIN cb),
       |assign AS (SELECT cid, cell FROM (SELECT cid, cell,
       |  row_number() OVER (PARTITION BY cid ORDER BY dist, cell) AS rn FROM ad) WHERE rn = 1),
       |pd AS (SELECT qid, cell, (${probeDist("e", "ctr")}) AS dist FROM q CROSS JOIN cb),
       |probes AS (SELECT qid, cell FROM (SELECT qid, cell,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, cell) AS rn FROM pd) WHERE rn <= 4),
       |sc AS (SELECT p.qid, a.cid,
       |  round(list_cosine_similarity(q.e::DOUBLE[], c.e::DOUBLE[]), 4) AS sim
       |  FROM assign a JOIN probes p ON a.cell = p.cell
       |  JOIN q ON q.qid = p.qid JOIN c ON c.cid = a.cid)
       |SELECT qid, cid, sim FROM (SELECT qid, cid, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM sc)
       |WHERE rn <= 3 ORDER BY qid, sim DESC, cid""".stripMargin

  /** Shared PQ machinery over unit vectors: per-(vector, subspace) codes
    * (argmin, first-j ties) and per-(query, subspace, centroid) LUT
    * entries narrowed to FLOAT exactly as PqExprs.lut stores them. */
  private def pqCodesAndLut(corpusFilter: String, queryFilter: String): String =
    s"""cd AS (SELECT n.vec_id AS cid, p.s, p.j, (${subDist("v", "ctr")}) AS dist
       |  FROM nv n CROSS JOIN pq p WHERE n.vec_id $corpusFilter),
       |codes AS (SELECT cid, s, j FROM (SELECT cid, s, j,
       |  row_number() OVER (PARTITION BY cid, s ORDER BY dist, j) AS rn FROM cd) WHERE rn = 1),
       |ld AS (SELECT n.vec_id AS qid, p.s, p.j, (${subDist("v", "ctr")})::FLOAT AS d
       |  FROM nv n CROSS JOIN pq p WHERE n.vec_id $queryFilter)""".stripMargin

  /** ADC = Σₛ lut[s] in subspace order: pivot the m=4 rows to columns so
    * the addition chain is explicit left-to-right, never an aggregate
    * with unspecified order. */
  private val AdcTail: String =
    s"""a4 AS (SELECT qid, cid,
       |  max(CASE WHEN s = 0 THEN dd END) AS d0, max(CASE WHEN s = 1 THEN dd END) AS d1,
       |  max(CASE WHEN s = 2 THEN dd END) AS d2, max(CASE WHEN s = 3 THEN dd END) AS d3
       |  FROM pair GROUP BY qid, cid),
       |adc AS (SELECT qid, cid, round(d0 + d1 + d2 + d3, 4) AS adc_dist FROM a4)
       |SELECT qid, cid, adc_dist, rnk FROM (SELECT qid, cid, adc_dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY adc_dist, cid) AS rnk FROM adc)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin

  /** l3e — plain PQ: every (query, candidate) pair ADC-scored. */
  val PqPinnedSql: String =
    s"""WITH $PqCte,
       |$NormCte,
       |${pqCodesAndLut(">= 5", "< 5")},
       |pair AS (SELECT l.qid, c.cid, c.s, l.d::DOUBLE AS dd
       |  FROM codes c JOIN ld l ON l.s = c.s AND l.j = c.j),
       |$AdcTail""".stripMargin

  /** l3f — IVFADC: cells and probes on UNIT vectors, ADC only on pairs
    * whose candidate cell survives the query's nprobe pruning. */
  val IvfAdcPinnedSql: String =
    s"""WITH $IvfUnitCte,
       |$PqCte,
       |$NormCte,
       |ad AS (SELECT n.vec_id AS cid, cell, (${assignDist("v", "ctr")}) AS dist
       |  FROM nv n CROSS JOIN cb WHERE n.vec_id >= 5),
       |assign AS (SELECT cid, cell FROM (SELECT cid, cell,
       |  row_number() OVER (PARTITION BY cid ORDER BY dist, cell) AS rn FROM ad) WHERE rn = 1),
       |pd AS (SELECT n.vec_id AS qid, cell, (${probeDist("v", "ctr")}) AS dist
       |  FROM nv n CROSS JOIN cb WHERE n.vec_id < 5),
       |probes AS (SELECT qid, cell FROM (SELECT qid, cell,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, cell) AS rn FROM pd) WHERE rn <= 4),
       |${pqCodesAndLut(">= 5", "< 5")},
       |pair AS (SELECT l.qid, c.cid, c.s, l.d::DOUBLE AS dd
       |  FROM codes c JOIN assign a ON a.cid = c.cid
       |  JOIN probes pr ON pr.cell = a.cell
       |  JOIN ld l ON l.qid = pr.qid AND l.s = c.s AND l.j = c.j),
       |$AdcTail""".stripMargin
}
