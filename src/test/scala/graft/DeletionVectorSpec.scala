package graft

import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

import graft.streaming.MergeSink

/** DELETION VECTORS (VERDICT r15 #4): a DELETE-ONLY commit retracts
  * keys by writing a `_dv/<version>` sidecar — O(metadata) — instead
  * of rewriting the owning bucket's version dir. Proven here: file
  * identity on the data dirs (zero data movement), read ≡ rewrite
  * semantics at head and under time travel, cumulative DVs across
  * deletes, the change feed carrying the retraction, an upsert rewrite
  * materializing (and clearing) the DV without resurrecting other
  * retracted keys, compaction + vacuum absorbing the debt, and erasure
  * scrubbing the subject's key out of retained DV files. */
class DeletionVectorSpec extends SparkTestBase {

  private def s: SparkSession = SparkTestBase.session

  /** `n` long keys routing to `bucket` under the store's own hash. */
  private def keysFor(bucket: Long, n: Int, nBuckets: Long): Seq[Long] =
    (1L to 100000L).iterator.filter(k =>
      MergeSink.bucketForInternalLiteral(k, LongType, nBuckets) == bucket)
      .take(n).toSeq

  /** All data files under the store's v* dirs with their mtimes —
    * the zero-movement witness (deliberately excludes `_dv`). */
  private def dataFileIdentity(store: String): Map[String, Long] = {
    val s0 = JFiles.walk(JPaths.get(store))
    try s0.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.matches(".*/v\\d+/.*\\.parquet$"))
      .map(p => p.toString -> JFiles.getLastModifiedTime(p).toMillis).toMap
    finally s0.close()
  }

  private def snap(store: String): Set[(Long, String, Long)] =
    s.read.format("graft").load(store).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("a point DELETE commits as a deletion vector: zero data movement, read semantics exact") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_dv").toString
    val store = s"$dir/store"
    val nB = 4
    val b0 = keysFor(0, 3, nB) // three keys sharing bucket 0
    val b1 = keysFor(1, 2, nB)
    val rows = (b0 ++ b1).zipWithIndex.map { case (k, i) =>
      (k, "upsert", 1L, s"n$k", i.toLong * 10)
    }
    MergeSink.applyBucketedBatch(rows.toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = nB) // v0
    val before = dataFileIdentity(store)
    assert(before.nonEmpty)

    // point delete via the SQL door → deletion vector, not a rewrite
    s.sql("DROP TABLE IF EXISTS dv_t")
    s.sql(s"CREATE TABLE dv_t USING graft LOCATION '$store'")
    try {
      s.sql(s"DELETE FROM dv_t WHERE k = ${b0.head}") // v1
      assert(MergeSink.latestVersion(store).contains(1L))
      assert(dataFileIdentity(store) == before,
        "a deletion-vector DELETE must move ZERO data-dir bytes")
      assert(JFiles.exists(JPaths.get(store, "_dv", "1", "_bucket=0")),
        "the retracted keys must land under _dv/1")
      assert(MergeSink.readManifestDv(store, 1L) == Map(0L -> 1L),
        "the manifest must record the bucket's dv reference")
      // reads: the key is gone, everything else intact
      val expect1 = rows.filter(_._1 != b0.head).map(t => (t._1, t._4, t._5)).toSet
      assert(snap(store) == expect1)
      // a pushed key-equality read (bucket-pruned point lookup) agrees
      assert(s.sql(s"SELECT * FROM dv_t WHERE k = ${b0.head}").collect().isEmpty)
      // time travel BEFORE the delete still shows the key
      assert(MergeSink.bucketedSnapshotAt(s, store, 0L)
        .filter(col("k") === b0.head).count() == 1)
      // the change feed carries the retraction as a normal delete
      val feed = MergeSink.storeChangesBetween(s, store, 0L, 1L).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed == Set((b0.head, "delete")), s"feed: $feed")

      // second delete in the SAME bucket: the new DV is CUMULATIVE
      s.sql(s"DELETE FROM dv_t WHERE k = ${b0(1)}") // v2
      assert(MergeSink.readManifestDv(store, 2L) == Map(0L -> 2L))
      assert(dataFileIdentity(store) == before)
      val expect2 = rows.filter(t => t._1 != b0.head && t._1 != b0(1))
        .map(t => (t._1, t._4, t._5)).toSet
      assert(snap(store) == expect2)
      // v1's read point still applies exactly ITS dv
      assert(MergeSink.bucketedSnapshotAt(s, store, 1L)
        .select("k").collect().map(_.getLong(0)).toSet ==
        rows.map(_._1).toSet - b0.head)

      // an UPSERT of a retracted key rewrites the bucket THROUGH the
      // DV: the re-inserted key returns, the OTHER retracted key must
      // NOT resurrect, and the bucket's dv token clears (serialized
      // writer path — covers mergeTouched's dv-applied base read)
      MergeSink.applyBucketedBatch(
        Seq((b0.head, "upsert", 2L, "back", 777L))
          .toDF("k", "op", "ver", "name", "v"),
        1L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = nB) // v3
      assert(MergeSink.readManifestDv(store, 3L).isEmpty,
        "a bucket rewrite must clear its dv token")
      val expect3 = expect2 + ((b0.head, "back", 777L))
      assert(snap(store) == expect3,
        "the rewrite must materialize the DV — no resurrection of " +
          s"${b0(1)}")

      // RESTORE across the dv boundary: back to v0 resurrects (the
      // restore point has no dv), forward to v2 re-arms exactly its dv
      MergeSink.restoreStore(s, store, 0L) // v4
      assert(snap(store) == rows.map(t => (t._1, t._4, t._5)).toSet)
      MergeSink.restoreStore(s, store, 2L) // v5
      assert(snap(store) == expect2)
      assert(MergeSink.readManifestDv(store, 5L) == Map(0L -> 2L))

      // COMPACTION materializes every DV; vacuum reclaims the dirs
      assert(MergeSink.compactBucketedStore(s, store).isDefined) // v6
      assert(MergeSink.readManifestDv(store, 6L).isEmpty)
      assert(snap(store) == expect2)
      MergeSink.vacuumBucketedStore(store)
      val dvLeft = {
        val p = JPaths.get(store, "_dv")
        if (!JFiles.exists(p)) Nil
        else { val l = JFiles.list(p); try l.toArray.toList finally l.close() }
      }
      assert(dvLeft.isEmpty, s"vacuum must reclaim dead _dv dirs: $dvLeft")
      assert(snap(store) == expect2)
    } finally s.sql("DROP TABLE IF EXISTS dv_t")
  }

  test("erasure scrubs the subject's key from retained DV files; DV deletes stay auditable") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_dv_erase").toString
    val store = s"$dir/store"
    val nB = 2
    val ks = keysFor(0, 3, nB)
    MergeSink.applyBucketedBatch(
      ks.map(k => (k, "upsert", 1L, s"n$k", k))
        .toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = nB) // v0
    // retract two keys via the DV path
    MergeSink.sqlDelete(store, Seq(col("k").isin(ks.take(2): _*)))
    assert(MergeSink.readManifestDv(store, 1L) == Map(0L -> 1L))
    // the subject (one of the retracted keys) exercises the GDPR path:
    // its key value must leave the DV files too
    assert(MergeSink.eraseKeys(s, store, Seq(ks.head).toDF("k")).isDefined)
    val dvKeysLeft = s.read.schema("k BIGINT")
      .parquet(JPaths.get(store, "_dv", "1").toString)
      .collect().map(_.getLong(0)).toSet
    assert(!dvKeysLeft.contains(ks.head),
      s"the erased subject's key must leave the DV files: $dvKeysLeft")
    assert(dvKeysLeft.contains(ks(1)),
      "other retracted keys stay in the DV (still retracting)")
    // reads: both retracted keys absent (one erased, one DV'd),
    // the third intact — at head AND at the pre-delete read point for
    // the erased subject
    assert(s.read.format("graft").load(store)
      .select("k").collect().map(_.getLong(0)).toSet == Set(ks(2)))
    assert(MergeSink.bucketedSnapshotAt(s, store, 0L)
      .select("k").collect().map(_.getLong(0)).toSet == ks.drop(1).toSet,
      "erasure reaches history; the DV'd-but-not-erased key remains " +
        "visible at the pre-delete read point")
  }
}
