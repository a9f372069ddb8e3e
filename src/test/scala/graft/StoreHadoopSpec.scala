package graft

import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.store.{StoreFiles, StorePath, StorePaths}
import graft.streaming.MergeSink

/** The store on a HADOOP-API filesystem (VERDICT r12 #1 — the one gap
  * between "scale-audited" and "scale-deployable"): every test here
  * runs against `graftlocal://` paths, a scheme that ONLY resolves
  * through `org.apache.hadoop.fs.FileSystem` (see [[GraftLocalFileSystem]]),
  * so a pass proves the full protocol — claims, pointer swaps,
  * manifests, schema registry, leases, vacuum, erasure, the SQL front
  * door and the catalog — speaks the object-store path layer end to
  * end, with zero java.nio fallback. */
class StoreHadoopSpec extends SparkTestBase {

  private def enableGraftLocal(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftlocal.impl", classOf[GraftLocalFileSystem].getName)
    hc.set("fs.AbstractFileSystem.graftlocal.impl",
      classOf[GraftLocalAbstractFs].getName)
  }

  /** A fresh graftlocal:// temp dir (local disk underneath, but every
    * access through the Hadoop layer). */
  private def remoteTmp(prefix: String): String = {
    enableGraftLocal()
    "graftlocal://" + java.nio.file.Files.createTempDirectory(prefix).toString
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

  // ------------------------------------------------------------------
  // the facade primitives, on the Hadoop backend
  // ------------------------------------------------------------------

  test("Hadoop backend: exclusive create, nio exception mapping, mtime, list, overwrite move") {
    val dir = StorePath(remoteTmp("graft_hio"))
    assert(dir.isRemote, s"$dir must route through the Hadoop backend")

    // exclusive create: second CREATE_NEW must throw the NIO exception
    // the claim protocol catches
    val marker = dir.resolve("claim")
    StoreFiles.write(marker, "a".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    intercept[java.nio.file.FileAlreadyExistsException] {
      StoreFiles.write(marker, "b".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    assert(new String(StoreFiles.readAllBytes(marker), "UTF-8") == "a")

    // missing file: the NIO NoSuchFileException the lease checks catch
    intercept[java.nio.file.NoSuchFileException] {
      StoreFiles.readAllBytes(dir.resolve("absent"))
    }
    intercept[java.nio.file.NoSuchFileException] {
      StoreFiles.getLastModifiedTime(dir.resolve("absent"))
    }

    // mtime write/read (the takeover-lease clock)
    StoreFiles.setLastModifiedTime(marker, FileTime.fromMillis(1234567890000L))
    assert(StoreFiles.getLastModifiedTime(marker).toMillis == 1234567890000L)

    // atomic overwrite move (the _latest pointer swap): FileContext path
    val tmp = dir.resolve(".latest.tmp")
    StoreFiles.write(tmp, "7".getBytes("UTF-8"))
    val latest = dir.resolve("_latest")
    StoreFiles.write(latest, "6".getBytes("UTF-8"))
    StoreFiles.move(tmp, latest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(new String(StoreFiles.readAllBytes(latest), "UTF-8") == "7")
    assert(!StoreFiles.exists(tmp))

    // listing returns child NAMES usable the way the protocol uses them
    StoreFiles.createDirectories(dir.resolve("sub"))
    val names = {
      val s = StoreFiles.list(dir)
      try {
        val it = s.iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .map(_.getFileName.toString).toSet
      } finally s.close()
    }
    assert(names == Set("claim", "_latest", "sub"))

    StoreFiles.deleteTree(dir)
    assert(!StoreFiles.exists(dir))
  }

  // ------------------------------------------------------------------
  // the full store protocol over graftlocal://
  // ------------------------------------------------------------------

  test("bucketed store lifecycle on a Hadoop-layer path: batches, time travel, CDF, compact, vacuum") {
    val store = remoteTmp("graft_hstore") + "/store"
    // k1/k2 land in DIFFERENT buckets so later single-bucket batches
    // leave the other bucket's owner behind (multi-version manifests)
    def bucketOf(k: Long): Long = spark.range(1)
      .select(pmod(xxhash64(lit(k)), lit(4L))).head().getLong(0)
    val k2 = (2L to 64L).find(k => bucketOf(k) != bucketOf(1L)).get
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (k2, "upsert", 1L, "b", 20L)), 0L)
    put(store, Seq((1L, "upsert", 2L, "a2", 11L)), 1L)
    put(store, Seq((k2, "delete", 3L, null, 0L)), 2L)

    assert(snap(store) == Set((1L, "a2", 11L)))
    assert(MergeSink.latestVersion(store).contains(2L))

    // time travel across the remote manifests
    val v0 = MergeSink.bucketedSnapshotAt(spark, store, 0L)
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(v0 == Set((1L, "a", 10L), (k2, "b", 20L)))

    // change feed between remote read points
    val changes = MergeSink.storeChangesBetween(spark, store, 0L, 2L)
      .select("k", "change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((1L, "update"), (k2, "delete")))

    // history + stats are remote metadata reads
    val hist = MergeSink.storeHistory(spark, store)
    assert(hist.count() == 3)
    assert(MergeSink.storeStats(spark, store).count() >= 1)

    // another key in k2's bucket: two live versions again, so compact
    // has real work, and vacuum then reclaims the superseded dirs
    val k3 = (2L to 64L).find(k => k != k2 && bucketOf(k) == bucketOf(k2)).get
    put(store, Seq((k3, "upsert", 4L, "c", 30L)), 3L)
    val compacted = MergeSink.compactBucketedStore(spark, store)
    assert(compacted.contains(4L))
    val dead = MergeSink.vacuumBucketedStore(store)
    assert(dead.nonEmpty)
    assert(snap(store) == Set((1L, "a2", 11L), (k3, "c", 30L)))
  }

  test("SQL front door on a Hadoop-layer path: read, bucket-pruned filter, INSERT, maintainStore") {
    import spark.implicits._
    val store = remoteTmp("graft_hsql") + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L),
      (3L, "upsert", 1L, "c", 30L)), 0L)

    val head = spark.read.format("graft").load(store)
    assert(head.count() == 3)
    // pushed key-equality read (drives remote bucket pruning)
    assert(head.filter(col("k") === 2L).select("name").head().getString(0) == "b")

    // INSERT through the V1 write hook commits OCC on the remote store
    Seq((4L, "d", 40L)).toDF("k", "name", "v")
      .write.format("graft").mode("append").save(store)
    assert(snap(store).contains((4L, "d", 40L)))

    // policy-driven maintenance on remote metadata
    val report = MergeSink.maintainStore(spark, store,
      MergeSink.MaintenancePolicy(maxFilesPerBucket = 1, maxLiveVersions = 1,
        retainLast = 1))
    assert(report.triggered)
    assert(snap(store).contains((4L, "d", 40L)))
  }

  test("erasure rewrites remote version dirs in place (history keeps shape, loses the subject)") {
    import spark.implicits._
    val store = remoteTmp("graft_herase") + "/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L)), 0L)
    put(store, Seq((1L, "upsert", 2L, "a2", 11L)), 1L)

    val audit = MergeSink.eraseKeys(spark, store, Seq(1L).toDF("k"))
    assert(audit.contains(2L))
    assert(snap(store) == Set((2L, "b", 20L)))
    // the HISTORICAL read point also lost the subject (files rewrote)
    val v0 = MergeSink.bucketedSnapshotAt(spark, store, 0L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(v0 == Set(2L))
  }

  test("catalog on a Hadoop-layer warehouse: CREATE TABLE, INSERT, SELECT, time travel") {
    val wh = remoteTmp("graft_hwh")
    spark.conf.set("spark.sql.catalog.grafth", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grafth.warehouse", wh)
    try {
      spark.sql("CREATE TABLE grafth.obs (k BIGINT, name STRING, v BIGINT) " +
        "TBLPROPERTIES (key = 'k', nBuckets = '4')")
      spark.sql("INSERT INTO grafth.obs VALUES (1, 'a', 10), (2, 'b', 20)")
      spark.sql("INSERT INTO grafth.obs VALUES (1, 'a2', 11)")
      val head = spark.sql("SELECT k, name, v FROM grafth.obs ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(head == Seq((1L, "a2", 11L), (2L, "b", 20L)))
      val asOf = spark.sql("SELECT k, name FROM grafth.obs VERSION AS OF 1 ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(asOf == Seq((1L, "a"), (2L, "b")))
    } finally {
      spark.conf.unset("spark.sql.catalog.grafth")
      spark.conf.unset("spark.sql.catalog.grafth.warehouse")
    }
  }

  test("streaming writes land on a Hadoop-layer store: writeStream in, change feed out") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = remoteTmp("graft_hstream") + "/store"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hstream_ck").toString
    val in = MemoryStream[(Long, String, Long, String, Long)]
    val writer = in.toDF().toDF("k", "op", "ver", "name", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$ckpt/in")
      .option("key", "k").option("nBuckets", "4")
      .start(store)
    try {
      in.addData((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L))
      writer.processAllAvailable()
      assert(snap(store) == Set((1L, "a", 10L), (2L, "b", 20L)))
      // the change feed reads back off the remote store
      val seen = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, String)]()
      val reader = spark.readStream.format("graft")
        .option("startingVersion", "earliest").load(store)
        .writeStream.option("checkpointLocation", s"$ckpt/out")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("k", "change").collect()
            .foreach(r => seen.add((r.getLong(0), r.getString(1)))): Unit
        }.start()
      try {
        in.addData((1L, "delete", 2L, null, 0L))
        writer.processAllAvailable()
        reader.processAllAvailable()
        import scala.jdk.CollectionConverters._
        assert(seen.asScala.toSet == Set((1L, "insert"), (2L, "insert"),
          (1L, "delete")), s"the remote hub must relay every change: $seen")
      } finally reader.stop()
    } finally writer.stop()
  }

  test("local paths keep local semantics: a plain path never routes remote") {
    assert(!StorePath("/tmp/x/store").isRemote)
    assert(!StorePath("file:/tmp/x/store").isRemote)
    assert(StorePath("hdfs://nn:8020/x").isRemote)
    assert(StorePath("s3a://bucket/x").isRemote)
    // resolve/sibling/name algebra matches nio on plain paths
    val p = StorePaths.get("/tmp/a", "b", "c")
    assert(p.toString == "/tmp/a/b/c")
    assert(p.getFileName.toString == "c")
    assert(p.resolveSibling("d").toString == "/tmp/a/b/d")
    val r = StorePath("graftlocal:///tmp/a").resolve("v3")
    assert(r.toString == "graftlocal:///tmp/a/v3")
    assert(r.getFileName.toString == "v3")
  }
}
