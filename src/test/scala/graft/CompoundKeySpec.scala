package graft

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.streaming.MergeSink

/** COMPOUND MERGE KEYS (VERDICT r15 #3): a store keyed on a column
  * TUPLE — declared as the comma-joined key name ("sid,mac"), recorded
  * verbatim in the `_key` registry, routed by `xxhash64` over the full
  * tuple. Proven here: the ingest/OCC/DML/feed/erasure/rebucket
  * lifecycle on a (sid, mac) store, deletion vectors over the tuple,
  * tuple-literal bucket pruning through the SQL door, and the
  * refusals (mismatched writer, partial erasure frame, key-component
  * rename/drop). */
class CompoundKeySpec extends SparkTestBase {

  private def s: SparkSession = SparkTestBase.session

  private def snap(store: String): Set[(Long, String, Long)] =
    s.read.format("graft").load(store).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("compound-key lifecycle: ingest, OCC, DML + deletion vector, CDF, erasure by tuple, rebucket") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_compound").toString
    val store = s"$dir/store"
    // (sid, mac) rows: same sid across macs and same mac across sids,
    // so per-component equality alone would be ambiguous — only the
    // tuple identifies a row
    MergeSink.applyBucketedBatch(
      Seq((1L, "aa", "upsert", 1L, 10L), (1L, "bb", "upsert", 1L, 20L),
        (2L, "aa", "upsert", 1L, 30L), (2L, "bb", "upsert", 1L, 40L))
        .toDF("sid", "mac", "op", "ver", "v"),
      0L, store, "sid,mac", "op", "ver", Seq("v"), nBuckets = 4) // v0
    assert(snap(store) == Set((1L, "aa", 10L), (1L, "bb", 20L),
      (2L, "aa", 30L), (2L, "bb", 40L)))
    // the registry records the compound key verbatim; a mismatched
    // writer (single component) refuses loudly
    assert(MergeSink.storedKeyName(store).contains("sid,mac"))
    val eKey = intercept[IllegalArgumentException] {
      MergeSink.applyBucketedBatch(
        Seq((9L, "zz", "upsert", 1L, 0L)).toDF("sid", "mac", "op", "ver", "v"),
        9L, store, "sid", "op", "ver", Seq("v"), nBuckets = 4)
    }
    assert(eKey.getMessage.contains("sid,mac"), eKey.getMessage)

    // upsert of ONE tuple replaces exactly that row (OCC writer path)
    MergeSink.applyBucketedBatchOcc(
      Seq((1L, "bb", "upsert", 2L, 21L)).toDF("sid", "mac", "op", "ver", "v"),
      0L, store, "sid,mac", "op", "ver", Seq("v"), nBuckets = 4,
      writer = "wA") // v1
    assert(snap(store) == Set((1L, "aa", 10L), (1L, "bb", 21L),
      (2L, "aa", 30L), (2L, "bb", 40L)))

    // SQL door: tuple point lookup, UPDATE, and a DV DELETE
    s.sql("DROP TABLE IF EXISTS cmp_t")
    s.sql(s"CREATE TABLE cmp_t USING graft LOCATION '$store'")
    try {
      assert(s.sql("SELECT v FROM cmp_t WHERE sid = 1 AND mac = 'bb'")
        .head().getLong(0) == 21L)
      s.sql("UPDATE cmp_t SET v = v + 100 WHERE sid = 2 AND mac = 'aa'") // v2
      assert(s.sql("SELECT v FROM cmp_t WHERE sid = 2 AND mac = 'aa'")
        .head().getLong(0) == 130L)
      // the DELETE retracts ONE tuple and commits as a deletion vector
      // over the compound key — zero data-dir movement
      val before = {
        val w = JFiles.walk(java.nio.file.Paths.get(store))
        try w.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.toString.matches(".*/v\\d+/.*\\.parquet$"))
          .map(p => p.toString -> JFiles.getLastModifiedTime(p).toMillis).toMap
        finally w.close()
      }
      s.sql("DELETE FROM cmp_t WHERE sid = 1 AND mac = 'aa'") // v3
      assert(MergeSink.readManifestDv(store, 3L).size == 1,
        "the tuple DELETE must land as a deletion vector")
      val after = {
        val w = JFiles.walk(java.nio.file.Paths.get(store))
        try w.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.toString.matches(".*/v\\d+/.*\\.parquet$"))
          .map(p => p.toString -> JFiles.getLastModifiedTime(p).toMillis).toMap
        finally w.close()
      }
      assert(after == before, "a DV DELETE must move zero data-dir bytes")
      assert(snap(store) == Set((1L, "bb", 21L),
        (2L, "aa", 130L), (2L, "bb", 40L)))
      // the same-sid sibling (1, "bb") and same-mac sibling (2, "aa")
      // survive — the retraction keyed on the TUPLE, not a component
    } finally s.sql("DROP TABLE IF EXISTS cmp_t")

    // change feed across the DML: tuple columns lead the row shape
    val feed = MergeSink.storeChangesBetween(s, store, 1L, 3L)
    assert(feed.columns.toSeq == Seq("sid", "mac", "change", "v_old", "v_new"))
    val changes = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(changes == Set((2L, "aa", "update"), (1L, "aa", "delete")),
      s"feed: $changes")

    // time travel before the DML shows the old state
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L)
      .filter(col("sid") === 1L && col("mac") === "aa").count() == 1)

    // erasure by TUPLE: the frame carries both key columns in order;
    // a single-column frame refuses with the compound contract named
    val ePart = intercept[IllegalArgumentException] {
      MergeSink.eraseKeys(s, store, Seq(2L).toDF("sid"))
    }
    assert(ePart.getMessage.contains("key column(s)"), ePart.getMessage)
    assert(MergeSink.eraseKeys(s, store,
      Seq((2L, "bb")).toDF("sid", "mac")).isDefined) // v4
    assert(snap(store) == Set((1L, "bb", 21L), (2L, "aa", 130L)))
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L)
      .filter(col("sid") === 2L && col("mac") === "bb").count() == 0,
      "erasure reaches history; the (2, aa) and (1, bb) siblings stay")

    // rebucket re-hashes the full tuple; reads and history hold
    assert(MergeSink.rebucketStore(s, store, 8).isDefined) // v5
    assert(snap(store) == Set((1L, "bb", 21L), (2L, "aa", 130L)))
    MergeSink.applyBucketedBatch(
      Seq((3L, "cc", "upsert", 3L, 50L)).toDF("sid", "mac", "op", "ver", "v"),
      1L, store, "sid,mac", "op", "ver", Seq("v"), nBuckets = 8) // v6
    assert(snap(store) == Set((1L, "bb", 21L), (2L, "aa", 130L),
      (3L, "cc", 50L)))

    // RESTORE across the chain: the pre-DV read point resurrects the
    // DV-retracted tuple, while the ERASED tuple stays gone (erasure
    // rewrote history physically)
    MergeSink.restoreStore(s, store, 2L) // v7
    assert(snap(store) == Set((1L, "aa", 10L), (1L, "bb", 21L),
      (2L, "aa", 130L)))
  }

  test("key-component rename and drop refuse with the compound contract named") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_compound_ref").toString
    val store = s"$dir/store"
    MergeSink.applyBucketedBatch(
      Seq((1L, "aa", "upsert", 1L, 10L)).toDF("sid", "mac", "op", "ver", "v"),
      0L, store, "sid,mac", "op", "ver", Seq("v"), nBuckets = 2)
    val eRen = intercept[IllegalArgumentException] {
      MergeSink.renameColumn(store, "mac", "mac2")
    }
    assert(eRen.getMessage.contains("KEY column"), eRen.getMessage)
    val eDrop = intercept[IllegalArgumentException] {
      MergeSink.dropColumn(store, "sid")
    }
    assert(eDrop.getMessage.contains("KEY column"), eDrop.getMessage)
    // non-key columns still evolve freely
    MergeSink.renameColumn(store, "v", "val")
    assert(s.read.format("graft").load(store).columns.toSeq ==
      Seq("sid", "mac", "val"))
  }
}
