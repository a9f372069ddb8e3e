package graft

import java.nio.file.{Files => NioFiles, Paths => NioPaths}

import org.apache.spark.sql.functions._

import graft.streaming.MergeSink

/** The PER-VERSION LAYOUT SIGNATURE (VERDICT r13 #2): every manifest
  * records the bucket count its commit routed by (`#nbuckets n`), so
  * a version dir's layout is self-describing. Pinned here: erasure
  * prunes each historical dir with ITS OWN modulus (even when the
  * legacy `_rebucket_floor` breadcrumb is gone — the pre-floor-build
  * shape), restore across a rebucket reverts the layout coherently,
  * and the `_nbuckets` registry file is a heal-able cache the
  * PUBLISHED head manifest outranks (the old usurped-rebucket
  * residual window). */
class StoreLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val vcols = Seq("name", "v")

  private def put(store: String, rows: Seq[(Long, String, Long, String, Long)],
      batch: Long, nBuckets: Int = 4): Unit =
    MergeSink.applyBucketedBatch(
      rows.toDF("k", "op", "ver", "name", "v"),
      batch, store, "k", "op", "ver", vcols, nBuckets = nBuckets)

  /** The writers' routing bucket for key `k` under `n` buckets. */
  private def bucketOf(k: Long, n: Int): Long =
    spark.range(1).select(pmod(xxhash64(lit(k)), lit(n.toLong)))
      .head().getLong(0)

  private def keysAt(store: String, v: Long): Set[Long] =
    MergeSink.bucketedSnapshotAt(spark, store, v)
      .select("k").collect().map(_.getLong(0)).toSet

  test("manifests carry the layout signature; effective count prefers the published head over the _nbuckets cache") {
    val dir = NioFiles.createTempDirectory("graft_layout_sig").toString
    val store = s"$dir/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L)), 0L)
    assert(MergeSink.manifestNBuckets(store, 0L).contains(4L))
    assert(MergeSink.storedNBuckets(store).contains(4L))
    // simulate the usurped-rebucket residual: a registry cache left on
    // a count that never published — the PUBLISHED manifest outranks it
    NioFiles.write(NioPaths.get(store, "_nbuckets"), "16".getBytes("UTF-8"))
    assert(MergeSink.storedNBuckets(store).contains(4L),
      "the published head's signature must outrank the registry cache")
    // the next writer (declaring the TRUE count) heals the cache
    put(store, Seq((3L, "upsert", 2L, "c", 30L)), 1L)
    assert(new String(NioFiles.readAllBytes(
      NioPaths.get(store, "_nbuckets")), "UTF-8").trim == "4")
    // and a writer declaring the stale cache's count is refused
    val e = intercept[IllegalArgumentException] {
      put(store, Seq((4L, "upsert", 3L, "d", 40L)), 2L, nBuckets = 16)
    }
    assert(e.getMessage.contains("bucketed into 4"), e.getMessage)
  }

  test("erasure prunes each historical dir with ITS OWN modulus — floor file gone, untouched old buckets not rewritten") {
    val dir = NioFiles.createTempDirectory("graft_layout_erase").toString
    val store = s"$dir/store"
    // enough keys that several old-layout buckets exist
    val keys = (1L to 16L).map(k => (k, "upsert", 1L, s"n$k", k * 10))
    put(store, keys, 0L)                        // v0 under 4 buckets
    assert(MergeSink.rebucketStore(spark, store, 8).contains(1L)) // v1 under 8
    // simulate a PRE-FLOOR build's rebucket: the breadcrumb is gone,
    // and every old-layout bucket id is also valid under the new count
    // — the legacy heuristics cannot see the layout change; only the
    // manifest's recorded signature can
    NioFiles.deleteIfExists(NioPaths.get(store, "_rebucket_floor"))
    val subject = 1L
    val subjectOldBucket = bucketOf(subject, 4)
    // a v0 bucket the subject does NOT live in under the OLD modulus:
    // its files must survive the erasure untouched (proof the old dir
    // was pruned with the old modulus, not rewritten wholesale)
    val spareBucket = (0L until 4L).find(_ != subjectOldBucket).get
    val spareDir = NioPaths.get(store, "v0", s"_bucket=$spareBucket")
    val sparePartsBefore = NioFiles.list(spareDir).toArray.map(_.toString).toSet
    assert(sparePartsBefore.nonEmpty)
    assert(MergeSink.eraseKeys(spark, store, Seq(subject).toDF("k")).contains(2L))
    // the subject is gone from EVERY retained read point, old layout included
    (0L to 2L).foreach { v =>
      assert(!keysAt(store, v).contains(subject),
        s"v$v still holds the erased subject")
    }
    // everything else survived
    assert(keysAt(store, 2L) == (2L to 16L).toSet)
    val sparePartsAfter = NioFiles.list(spareDir).toArray.map(_.toString).toSet
    assert(sparePartsAfter == sparePartsBefore,
      "an old-layout bucket outside the subject's OLD modulus must not rewrite")
  }

  test("restore across a rebucket reverts the layout; the registry heals to the restore point's recorded count") {
    val dir = NioFiles.createTempDirectory("graft_layout_restore").toString
    val store = s"$dir/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L),
      (3L, "upsert", 1L, "c", 30L)), 0L)        // v0 under 4 buckets
    assert(MergeSink.rebucketStore(spark, store, 8).contains(1L)) // v1 under 8
    val restored = MergeSink.restoreStore(spark, store, 0L)       // v2 = v0 again
    assert(restored == 2L)
    // the restore point's layout travels with its manifest
    assert(MergeSink.manifestNBuckets(store, 2L).contains(4L))
    assert(MergeSink.storedNBuckets(store).contains(4L))
    assert(new String(NioFiles.readAllBytes(
      NioPaths.get(store, "_nbuckets")), "UTF-8").trim == "4")
    // writers on the restored (old) layout proceed; new-layout writers refuse
    put(store, Seq((4L, "upsert", 2L, "d", 40L)), 1L)
    assert(keysAt(store, 3L) == Set(1L, 2L, 3L, 4L))
    val e = intercept[IllegalArgumentException] {
      put(store, Seq((5L, "upsert", 3L, "e", 50L)), 2L, nBuckets = 8)
    }
    assert(e.getMessage.contains("bucketed into 4"), e.getMessage)
  }
}
