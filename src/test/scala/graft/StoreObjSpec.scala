package graft

import java.nio.file.attribute.FileTime

import graft.store.{StoreFiles, StorePath, StorePaths}
import graft.streaming.MergeSink

/** The store protocol under ADVERSARIAL object-store semantics
  * (VERDICT r13 #1): every test runs on `graftobj://` paths
  * ([[GraftObjFileSystem]] — no overwrite-rename, no
  * `AbstractFileSystem` binding so every pointer swap takes the
  * DELETE-THEN-RENAME fallback of `graft.store.StoreIO`, `setTimes` a
  * silent no-op, and a fault injector that stretches the
  * delete-to-rename missing-pointer window). A pass turns the path
  * layer's CAS-analogue table from scaladoc into tested behavior:
  * the fallback swap, the missing-pointer reader retry, the re-PUT
  * heartbeat and the claim CAS are each exercised BY NAME. */
class StoreObjSpec extends SparkTestBase {

  private def enableGraftObj(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftobj.impl", classOf[GraftObjFileSystem].getName)
    // deliberately NO fs.AbstractFileSystem.graftobj.impl: the
    // FileContext overwrite-rename must be unavailable, forcing the
    // delete-then-rename fallback on every pointer swap
  }

  /** A fresh graftobj:// temp dir, plus its raw local twin (for aging
    * lease clocks past the no-op setTimes, the way a real test would
    * manipulate S3 object metadata out of band). */
  private def objTmp(prefix: String): (String, String) = {
    enableGraftObj()
    val local = java.nio.file.Files.createTempDirectory(prefix).toString
    ("graftobj://" + local, local)
  }

  private val vcols = Seq("name", "v")

  private def put(store: String, rows: Seq[(Long, String, Long, String, Long)],
      batch: Long): Unit = {
    import spark.implicits._
    MergeSink.applyBucketedBatch(
      rows.toDF("k", "op", "ver", "name", "v"),
      batch, store, "k", "op", "ver", vcols, nBuckets = 4)
  }

  private def snap(store: String) =
    MergeSink.currentBucketedSnapshot(spark, store).get
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("no AbstractFileSystem binding: pointer swaps take the delete-then-rename fallback; rename refuses an existing destination") {
    val (obj, _) = objTmp("graft_obj_prim")
    val dir = StorePath(obj)
    assert(dir.isRemote)

    // overwrite move works ONLY via the fallback (delete + rename):
    // FileContext is unavailable for this scheme by construction
    val tmp = dir.resolve(".latest.tmp")
    val latest = dir.resolve("_latest")
    StoreFiles.write(tmp, "7".getBytes("UTF-8"))
    StoreFiles.write(latest, "6".getBytes("UTF-8"))
    StoreFiles.move(tmp, latest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(new String(StoreFiles.readAllBytes(latest), "UTF-8") == "7")

    // the EXCLUSIVE move (marker capture / version-dir publish shape)
    // refuses an existing destination loudly — the object store's
    // rename cannot overwrite, and the path layer must surface that
    // as a refusal, never a silent replace
    val src2 = dir.resolve("a")
    StoreFiles.write(src2, "x".getBytes("UTF-8"))
    val e = intercept[java.io.IOException] {
      StoreFiles.move(src2, latest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    assert(e.getMessage.contains("destination exists"), e.getMessage)
    assert(new String(StoreFiles.readAllBytes(latest), "UTF-8") == "7",
      "the refused move must leave the destination untouched")
  }

  test("setTimes is a no-op: the claim heartbeat detects it by read-back and refreshes the lease by re-PUT") {
    val (obj, local) = objTmp("graft_obj_hb")
    val marker = StorePath(obj).resolve("claim")
    StoreFiles.write(marker, "0 5 12345".getBytes("UTF-8"))
    // age the lease clock OUT OF BAND (raw local twin — setTimes on
    // the graftobj path is the silent no-op under test)
    val raw = java.nio.file.Paths.get(local, "claim")
    val aged = System.currentTimeMillis() - 20L * 60 * 1000
    java.nio.file.Files.setLastModifiedTime(raw, FileTime.fromMillis(aged))
    assert(StoreFiles.getLastModifiedTime(marker).toMillis == aged)
    // the heartbeat's refresh: fs.setTimes silently no-ops, the
    // read-back sees the stale mtime, and the backend re-PUTs the
    // marker's own bytes — the lease clock moves, the content doesn't
    val now = System.currentTimeMillis()
    StoreFiles.setLastModifiedTime(marker, FileTime.fromMillis(now))
    val refreshed = StoreFiles.getLastModifiedTime(marker).toMillis
    assert(refreshed >= now - 5000,
      s"lease clock must move on an object store (was $aged, now $refreshed)")
    assert(new String(StoreFiles.readAllBytes(marker), "UTF-8") == "0 5 12345",
      "the re-PUT refresh must preserve the claim content")
  }

  test("full bucketed lifecycle on graftobj://: batches, time travel, erasure — zero FileContext, zero java.nio") {
    val (obj, _) = objTmp("graft_obj_life")
    val store = obj + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L)), 0L)
    put(store, Seq((2L, "upsert", 2L, "b2", 21L), (3L, "upsert", 2L, "c", 30L)), 1L)
    assert(snap(store) == Set((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L)))
    assert(MergeSink.bucketedSnapshotAt(spark, store, 0L)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // erasure's backup-move/swap-in dance on the no-overwrite-rename fs
    import spark.implicits._
    MergeSink.eraseKeys(spark, store, Seq(2L).toDF("k"))
    assert(snap(store) == Set((1L, "a", 10L), (3L, "c", 30L)))
    assert(MergeSink.bucketedSnapshotAt(spark, store, 0L)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L),
      "erasure must reach historical dirs through the object-store layer")
  }

  test("missing-pointer reader retry: a reader polling across the stretched delete-then-rename window never sees an empty store") {
    val (obj, _) = objTmp("graft_obj_swap")
    val store = obj + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L)), 0L) // evidence: _lastBatch
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try MergeSink.latestVersion(store) match {
          case Some(v) => seen.add(v)
          case None => failures.add(new AssertionError(
            "reader saw a committed store as empty"))
        } catch { case t: Throwable => failures.add(t) }
      }
    }, "graftobj-head-reader")
    GraftObjFileSystem.renameDelayMs = 120L
    try {
      reader.start()
      put(store, Seq((2L, "upsert", 2L, "b", 20L)), 1L)
      put(store, Seq((3L, "upsert", 3L, "c", 30L)), 2L)
    } finally {
      GraftObjFileSystem.renameDelayMs = 0L
      stop.set(true)
      reader.join(10000)
    }
    assert(failures.isEmpty, s"reader failures: ${failures}")
    val observed = seen.iterator()
    var prev = -1L
    var n = 0
    while (observed.hasNext) {
      val v = observed.next()
      assert(v >= prev, s"head went backwards: $prev -> $v")
      prev = v; n += 1
    }
    assert(n > 0 && prev == 2L, s"reader must land on the final head (saw $n reads, last $prev)")
    assert(snap(store) == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("claim CAS via create-if-absent: a second writer from a stale parent is refused, never a lost update") {
    import spark.implicits._
    val (obj, _) = objTmp("graft_obj_race")
    val store = obj + "/plain"
    val df0 = Seq((1L, "upsert", 1L, "a", 10L)).toDF("k", "op", "ver", "name", "v")
    val df1 = Seq((2L, "upsert", 1L, "b", 20L)).toDF("k", "op", "ver", "name", "v")
    MergeSink.applyBatch(df0, 0L, store, "k", "op", "ver", vcols)
    MergeSink.applyBatch(df1, 1L, store, "k", "op", "ver", vcols)
    // a writer that derived from the SUPERSEDED parent v0 targets the
    // already-claimed v1 slot: the exclusive marker create is the CAS
    // and must refuse the lost update loudly
    val e = intercept[java.util.ConcurrentModificationException] {
      MergeSink.applyBatchFrom(Some(0L),
        Seq((9L, "upsert", 1L, "z", 90L)).toDF("k", "op", "ver", "name", "v"),
        7L, store, "k", "op", "ver", vcols)
    }
    assert(e.getMessage.contains("already committed against parent") ||
      e.getMessage.contains("committed to"), e.getMessage)
  }

  test("abandoned-claim takeover on graftobj://: capture, lease re-verify, recover — with the lease aged out of band") {
    val (obj, local) = objTmp("graft_obj_tko")
    val store = obj + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L)), 0L)
    // a dead writer's claim on the next slot, aged past the takeover
    // lease via the raw local twin (setTimes on the store path is the
    // no-op under test; a real operator ages S3 objects by re-PUT)
    val marker = StorePaths.get(store, "_commits", "1")
    StoreFiles.write(marker, "0 99 424242".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(local, "store", "_commits", "1"),
      FileTime.fromMillis(System.currentTimeMillis() - 20L * 60 * 1000))
    // the next batch must take the abandoned claim over (atomic
    // capture through the object-store layer) and commit normally
    put(store, Seq((2L, "upsert", 2L, "b", 20L)), 1L)
    assert(snap(store) == Set((1L, "a", 10L), (2L, "b", 20L)))
    assert(MergeSink.latestVersion(store).contains(1L))
  }

  test("capture/restore on graftobj:// preserves the ORIGINAL lease deadline (hb token carries the clock)") {
    val (obj, _) = objTmp("graft_obj_clock")
    val commits = StorePath(obj).resolve("_commits")
    StoreFiles.createDirectories(commits)
    val marker = commits.resolve("5")
    // a live writer's claim, 4 min into its 10-min lease, carried by
    // the content hb token (as every claim since the token protocol)
    val t0 = System.currentTimeMillis() - 4L * 60 * 1000
    StoreFiles.write(marker, s"4 7 123456789 hb$t0".getBytes("UTF-8"))
    // a takeover probe racing the heartbeat captures the marker, finds
    // it FRESH, and must restore it — on the object store the restored
    // file's mtime is "now" (CREATE_NEW; setTimes cannot go backward),
    // so the hb token is the only exact carrier of the lease clock
    assert(!MergeSink.captureStaleMarker(marker),
      "a fresh claim must be restored, not freed")
    assert(StoreFiles.exists(marker), "the restored marker must exist")
    assert(new String(StoreFiles.readAllBytes(marker), "UTF-8")
      .contains(s"hb$t0"), "the restore must carry the original hb token")
    assert(MergeSink.markerClockMillis(marker) == t0,
      "the restored lease clock must be EXACTLY the original — no " +
        "fresh lease from the capture/restore round trip")
    // and a token aged past the lease IS captured despite a fresh
    // mtime: the clock is min(mtime, token)
    val t1 = System.currentTimeMillis() - 20L * 60 * 1000
    StoreFiles.write(marker, s"4 7 123456789 hb$t1".getBytes("UTF-8"))
    assert(MergeSink.captureStaleMarker(marker),
      "a token-stale claim must be freed even with a fresh mtime")
    assert(!StoreFiles.exists(marker))
  }

  test("concurrent OCC writers on graftobj://: disjoint keys all land, a contended bucket serializes — no lost update on the no-atomic-rename backend") {
    import spark.implicits._
    val (obj, _) = objTmp("graft_obj_occ")
    val store = obj + "/store"
    // three writers, each with its own key range (disjoint content we
    // can assert exactly) plus ONE shared hot key everybody contends
    // on — the shape that exercises claim CAS, in-flight conflict
    // backoff, publication waits and the delete-then-rename pointer
    // swap all at once
    val writers = Seq("wA", "wB", "wC")
    val perWriter = 8
    val sharedKey = 1000L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      writers.zipWithIndex.map { case (w, wi) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try (0 until perWriter).foreach { b =>
              val own = (wi * 100 + b).toLong
              MergeSink.applyBucketedBatchOcc(
                Seq((own, "upsert", b.toLong + 1, s"$w-$b", own),
                  (sharedKey, "upsert", b.toLong + 1, s"$w-hot-$b", own))
                  .toDF("k", "op", "ver", "name", "v"),
                b.toLong, store, "k", "op", "ver", vcols,
                nBuckets = 4, writer = w)
            } catch { case t: Throwable => failures.add(t) }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(failures.isEmpty, s"writer failures: ${failures}")
    val got = snap(store)
    // every writer's own keys carry its LAST batch's values exactly
    writers.zipWithIndex.foreach { case (w, wi) =>
      (0 until perWriter).foreach { b =>
        val own = (wi * 100 + b).toLong
        assert(got.contains((own, s"$w-$b", own)),
          s"writer $w's key $own lost (got ${got.filter(_._1 == own)})")
      }
    }
    // the contended key holds SOME writer's final write — never a torn
    // or vanished row
    val hot = got.filter(_._1 == sharedKey)
    assert(hot.size == 1 &&
      writers.exists(w => hot.head._2.startsWith(s"$w-hot-")), s"hot: $hot")
    // exactly-once per (writer, batch): 24 commits, linear history
    assert(MergeSink.latestVersion(store).contains(
      (writers.size * perWriter - 1).toLong))
    // every retained read point is still materializable through the
    // object-store layer
    val head = MergeSink.latestVersion(store).get
    (0L to head).foreach { v =>
      assert(MergeSink.bucketedSnapshotAt(spark, store, v).count() >= 1)
    }
    // and a replayed batch from any writer is a no-op
    MergeSink.applyBucketedBatchOcc(
      Seq((0L, "upsert", 99L, "replay", -1L)).toDF("k", "op", "ver", "name", "v"),
      (perWriter - 1).toLong, store, "k", "op", "ver", vcols,
      nBuckets = 4, writer = "wA")
    assert(MergeSink.latestVersion(store).contains(head),
      "a replayed (writer, batch) must not commit")
  }

  test("CONVERT TO GRAFT on graftobj://: in-place adoption, originals swept, store verbs follow — all through the object-store layer") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val (obj, local) = objTmp("graft_obj_convert")
    val plain = obj + "/plain"
    Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("name", "k", "v").coalesce(1).write.parquet(plain)
    assert(MergeSink.convertToStore(spark, plain, "k", nBuckets = 4) == 0L)
    // originals swept through the Hadoop layer; the dir is now a store
    val loose = java.nio.file.Files.list(
        java.nio.file.Paths.get(local, "plain")).iterator()
      .asScala.map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") && !n.startsWith("v"))
      .toList
    assert(loose.isEmpty, s"originals must be swept: $loose")
    assert(snap(plain) == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    // a follow-up batch and time travel work on the adopted store
    put(plain, Seq((2L, "upsert", 2L, "b2", 21L)), 0L)
    assert(snap(plain) == Set((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L)))
    assert(MergeSink.bucketedSnapshotAt(spark, plain, 0L)
      .filter("k = 2").select("v").head().getLong(0) == 20L)
  }

  test("change-feed subscriber across vacuum on graftobj://: delivery continues, aged-out start fails loudly") {
    import spark.implicits._
    val (obj, _) = objTmp("graft_obj_sub")
    val store = obj + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L)), 0L)
    put(store, Seq((1L, "upsert", 2L, "a2", 11L)), 1L)
    put(store, Seq((1L, "upsert", 3L, "a3", 12L)), 2L)
    var delivered = Vector.empty[(Long, Long, Long)]
    assert(MergeSink.pollChanges(spark, store, "s1",
      startAtVersion = Some(0L)) { (df, from, to) =>
      delivered :+= ((from, to, df.count()))
    })
    assert(delivered == Vector((0L, 2L, 1L)))
    // maintenance + vacuum through the object-store layer
    MergeSink.compactBucketedStore(spark, store)
    MergeSink.vacuumBucketedStore(store)
    put(store, Seq((2L, "upsert", 4L, "b", 20L)), 3L)
    assert(MergeSink.pollChanges(spark, store, "s1") { (df, from, to) =>
      delivered :+= ((from, to, df.count()))
    })
    assert(delivered.last._3 >= 1L, "the subscriber keeps receiving after vacuum")
  }
}
