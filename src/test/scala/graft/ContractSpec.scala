package graft

/** Driver-contract guards: the oracle map and query map must stay in
  * lockstep (a dangling oracle key or an unintentionally oracle-less
  * query silently weakens the correctness gate). */
class ContractSpec extends SparkTestBase {

  test("every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle keys without queries: $dangling")
  }

  test("rows-only queries are exactly the documented approximate ops") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set(
      "a2b_approx_distinct",  // HLL sketch — approximate by design
      "a2c_hll_union",        // DataSketches HLL union — approximate
      "a8b_approx_percentiles", // KLL-style percentile sketch — approximate
      "a11_topk_sketch",      // frequent-items sketch — approximate
      // l2b_minhash_pairs / l2e_simhash_pairs were promoted to
      // hash-checked in round 6 (md5-family banding replays in SQL)
      // l3b_ann_lsh promoted to hash-checked in round 12: its
      // hyperplane mix is deterministic, so the table replays as
      // generated rational literals (AnnPinnedOracle.LshPinnedSql)
      "l3c_ann_ivf",          // approximate NN
      "l3e_pq_ann",           // approximate NN (product quantization)
      "l3f_ivfadc",           // approximate NN (IVF pruning + ADC scoring)
      // l5d_cdc_chunks promoted to hash-checked in round 7 (pre-masked
      // gear table + recursive-CTE walk replays the fold in SQL)
      "mm_media_features",    // real PNG codec (ImageIO) — not SQL-expressible
      "mm_phash_pairs")       // dHash rides the same real codec — not SQL-expressible
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"stale documentation: ${documented -- rowsOnly}")
  }

  test("every query builds a plan against sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, name)
    }
  }

  test("entry smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
