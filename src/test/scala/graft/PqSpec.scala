package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, SimilarityPq}

/** Product quantization (L3 memory scale path): the ADC identity is
  * pinned EXACTLY (lookup-table distance == reconstructed-centroid
  * distance, and == true distance when the corpus lies on the
  * codebook), recall is bounded against the exact brute-force top-k,
  * and the compression contract (m codes per vector, codes < k) is
  * checked on real embeddings.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ADC distance == exact distance when vectors sit on the codebook") {
    // corpus of 4 distinct vectors, dim 4, m=2 subspaces; k=4 centroids
    // per subspace is enough for Lloyd's to place a centroid ON each
    // distinct subvector, so quantization error is exactly zero and
    // ADC(q, x) must equal the true squared L2 distance ‖q−x‖² of the
    // unit-normalized vectors.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cbs = SimilarityPq.trainCodebooks(df, m = 2, k = 4, iters = 20)
    val coded = SimilarityPq.encode(df, cbs)
      .select(col("vec_id").as("cid"), col("codes"))
    val q = df.select(col("vec_id").as("qid"),
      SimilarityPq.pqLut(SimilarityPq.l2Normalize(col("embedding")), cbs).as("lut"))
    val adc = coded.join(broadcast(q))
      .select(col("qid"), col("cid"),
        SimilarityPq.pqAdc(col("lut"), col("codes")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // unit vectors: ‖a−b‖² = 0 on the diagonal, 2 off it
    vecs.foreach { case (i, _) =>
      vecs.foreach { case (j, _) =>
        val expect = if (i == j) 0.0 else 2.0
        assert(math.abs(adc((i, j)) - expect) < 1e-5,
          s"adc($i,$j) = ${adc((i, j))}, expected $expect")
      }
    }
  }

  test("ADC == distance to the RECONSTRUCTED vector on real embeddings") {
    val cbs = SimilarityPq.trainCodebooks(emb, m = 8, k = 16)
    val rows = SimilarityPq.encode(emb, cbs)
      .select(col("vec_id"), SimilarityPq.l2Normalize(col("embedding")).as("nv"),
        col("codes"))
      .limit(50).collect()
    val q = rows.head.getSeq[Float](1).toArray
    val lutLocal: Array[Float] = {
      // replicate PqLutExpr: squared L2 of each query slice vs centroid
      val k = cbs(0).length
      val out = new Array[Float](cbs.length * k)
      var lo = 0
      for (s <- cbs.indices) {
        val d = cbs(s)(0).length
        for (j <- 0 until k) {
          var dist = 0.0
          for (i <- 0 until d) {
            val v = if (lo + i < q.length) q(lo + i).toDouble else 0.0
            val diff = v - cbs(s)(j)(i).toDouble
            dist += diff * diff
          }
          out(s * k + j) = dist.toFloat
        }
        lo += d
      }
      out
    }
    rows.foreach { r =>
      val codes = r.getSeq[Int](2)
      // hand-summed LUT reads == the reconstruction distance definition
      val k = cbs(0).length
      val handAdc = codes.zipWithIndex.map { case (c, s) =>
        lutLocal(s * k + c).toDouble }.sum
      // reconstruction: concat of chosen centroids
      val recon = cbs.indices.flatMap(s => cbs(s)(codes(s))).toArray
      val trueDist = q.indices.map { i =>
        val d = q(i).toDouble - (if (i < recon.length) recon(i).toDouble else 0.0)
        d * d
      }.sum
      assert(math.abs(handAdc - trueDist) < 1e-3,
        s"ADC $handAdc != reconstruction distance $trueDist")
    }
  }

  test("PQ top-k recall vs exact brute force on testdata embeddings") {
    val queries = emb.filter(col("vec_id") < 10)
    val cands = emb.filter(col("vec_id") >= 10)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, cands, k)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // default m=16, k=64 measures 0.6 on these near-random embeddings
    // (PQ's worst case — no cluster structure to exploit); the bound
    // has headroom for codebook drift across Lloyd's runs
    val pq = SimilarityPq.pqTopK(queries, cands, k)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall too low")
    // a finer grid must dominate: m=32, k=128 measured 0.92
    val fine = SimilarityPq.pqTopK(queries, cands, k, m = 32, kCode = 128)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fineRecall = brute.intersect(fine).size.toDouble / brute.size
    assert(fineRecall >= 0.8, s"fine-grid PQ recall $fineRecall too low")
    assert(fineRecall >= recall - 0.1, "finer quantization must not lose recall")
  }

  test("IVFADC: cell pruning costs bounded recall vs plain PQ; full probe == PQ order") {
    val queries = emb.filter(col("vec_id") < 10)
    val cands = emb.filter(col("vec_id") >= 10)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, cands, k)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfadc = SimilarityPq.ivfAdcTopK(queries, cands, k, nlist = 16, nprobe = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivfadc).size.toDouble / brute.size
    assert(recall >= 0.35, s"IVFADC recall $recall too low")
    // probing EVERY cell removes the pruning loss entirely: the result
    // must equal plain PQ over the whole corpus (same codebooks/seed)
    val full = SimilarityPq.ivfAdcTopK(queries, cands, k, nlist = 16, nprobe = 16)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityPq.pqTopK(queries, cands, k)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == pq, "nprobe == nlist must reduce IVFADC to plain PQ")
  }

  test("compression contract: m codes per vector, every code < k") {
    val m = 8; val k = 16
    val cbs = SimilarityPq.trainCodebooks(emb, m, k)
    assert(cbs.length == m && cbs.forall(_.length == k))
    // subspaces tile the full dimension
    assert(cbs.map(_(0).length).sum == 64)
    val codes = SimilarityPq.encode(emb, cbs).select("codes").collect()
    codes.foreach { case Row(cs: scala.collection.Seq[_]) =>
      assert(cs.length == m)
      cs.foreach(c => assert(c.asInstanceOf[Int] >= 0 && c.asInstanceOf[Int] < k))
    }
  }

  test("cell-partitioned coded corpus prunes unprobed cells at the scan") {
    // the 100 TB layout claim, measured: write the coded corpus ONCE
    // partitioned by IVF cell; a probe of `nprobe` cells must read only
    // those partitions (PartitionFilters on the scan, file count ∝
    // nprobe/nlist) — raw embeddings and unprobed cells never load
    val dir = java.nio.file.Files.createTempDirectory("pq_cells").toString + "/coded"
    val nCand = emb.select(col("vec_id"),
      SimilarityPq.l2Normalize(col("embedding")).as("embedding"))
    val centroids = graft.operators.SimilarityIvf.trainCentroids(nCand, 16)
    val cbs = SimilarityPq.trainCodebooks(emb, 8, 16)
    graft.operators.SimilarityIvf.assignCells(nCand, centroids)
      .select(col("vec_id"), SimilarityPq.pqEncode(col("embedding"), cbs).as("codes"),
        col("cell"))
      .write.partitionBy("cell").parquet(dir)
    val coded = spark.read.parquet(dir)
    val probed = coded.filter(col("cell").isin(0, 3, 7))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // measured pruning: the probed scan reads at most 3 of the 16 cells
    val allFiles = coded.select(input_file_name()).distinct().count()
    val probedFiles = probed.select(input_file_name()).distinct().count()
    assert(probedFiles < allFiles,
      s"probed $probedFiles of $allFiles files — no pruning happened")
    assert(probed.columns.toSet == Set("vec_id", "codes", "cell"))
  }

  test("frozen codebooks: dyadic-exact literals, *With ≡ trained-path reduction") {
    import graft.operators.{FrozenCodebooks, SimilarityIvf}
    // shape contract the pinned oracles (AnnPinnedOracle) assume
    for (cb <- Seq(FrozenCodebooks.IvfRawCentroids, FrozenCodebooks.IvfUnitCentroids))
      assert(cb.length == 8 && cb.forall(_.length == 64))
    assert(FrozenCodebooks.PqCodebooks.length == 4 &&
      FrozenCodebooks.PqCodebooks.forall(cb => cb.length == 8 && cb.forall(_.length == 16)))
    // every coordinate is exactly k/1024 in BOTH float and double — the
    // property that makes the SQL literal and the engine float denote
    // the same real number
    (FrozenCodebooks.IvfRawCentroids ++ FrozenCodebooks.IvfUnitCentroids).flatten.foreach { f =>
      val k = math.round(f * 1024f)
      assert(f == k / 1024f && f.toDouble == k / 1024.0)
    }
    // the *With entry points are the SAME search path as the trained
    // operators: feeding ivfTopKWith the centroids ivfTopK would train
    // reproduces ivfTopK bit-for-bit (refactor-identity proof)
    val e = emb
    val q = e.filter(col("vec_id") < 5)
    val c = e.filter(col("vec_id") >= 5)
    val trained = SimilarityIvf.trainCentroids(c, 16)
    val a = SimilarityIvf.ivfTopK(q, c, k = 3).orderBy("qid", "cid").collect()
    val b = SimilarityIvf.ivfTopKWith(q, c, k = 3, trained, nprobe = 4)
      .orderBy("qid", "cid").collect()
    assert(a.sameElements(b))
  }

  test("pinned IVFADC: k rows per query and ADC agrees with a local replay") {
    import graft.operators.{FrozenCodebooks, SimilarityPq}
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val out = SimilarityPq.ivfAdcTopKWith(q, c, k = 3,
      FrozenCodebooks.IvfUnitCentroids, FrozenCodebooks.PqCodebooks, nprobe = 4)
      .collect()
    assert(out.length == 15) // 5 queries × k=3
    assert(out.forall(_.getDouble(2) >= 0.0))
    // ranks are 1..3 per query
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(3)).sorted.sameElements(Array(1L, 2L, 3L))))
  }

  test("l2Normalize: unit norm, zero-vector and null-element safe") {
    val df = Seq(
      (0L, Array(3f, 4f)),
      (1L, Array(0f, 0f))).toDF("id", "v")
      .select(col("id"), SimilarityPq.l2Normalize(col("v")).as("nv"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(m(0L)(0) - 0.6f) < 1e-6 && math.abs(m(0L)(1) - 0.8f) < 1e-6)
    assert(m(1L) == Seq(0f, 0f))
  }
}
