package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.MergeSink

/** The MERGE store's SQL front door (VERDICT r11 #1): the store as a
  * first-class Spark table — `format("graft")` batch reads, versionAsOf
  * time travel, `CREATE TABLE ... USING graft`, the change feed as a
  * streaming source, and the scale property that makes the door worth
  * having: a pushed key-equality filter scans ONLY the owning bucket's
  * dirs (proven physically — the un-owning dir is deleted out from
  * under the read). */
class GraftTableSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private val vcols = Seq("name", "v")

  private def put(store: String, k: Long, ver: Long, name: String,
      batch: Long, n: Int = 4): Unit = {
    import spark.implicits._
    MergeSink.applyBucketedBatch(
      Seq((k, "upsert", ver, name, ver * 10)).toDF("k", "op", "ver", "name", "v"),
      batch, store, "k", "op", "ver", vcols, nBuckets = n)
  }

  private def rows(df: DataFrame) = df.select("k", "name", "v").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def bucketOf(k: Long): Long = spark.range(1)
    .select(pmod(xxhash64(lit(k)), lit(4L))).head().getLong(0)

  test("format(\"graft\") head read == currentBucketedSnapshot; versionAsOf == time travel") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val store = s"$dir/store"
    val k2 = (2L to 64L).find(k => bucketOf(k) != bucketOf(1L)).get
    MergeSink.applyBucketedBatch(
      Seq((1L, "upsert", 1L, "a", 10L), (k2, "upsert", 1L, "b", 20L))
        .toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", vcols, nBuckets = 4)
    put(store, 1L, 2L, "a2", 1L)

    val head = spark.read.format("graft").load(store)
    assert(head.schema.fieldNames.toSeq == Seq("k", "name", "v"))
    assert(rows(head) == rows(MergeSink.currentBucketedSnapshot(spark, store).get))
    assert(rows(head) == Set((1L, "a2", 20L), (k2, "b", 20L)))

    val asOf = spark.read.format("graft").option("versionAsOf", "0").load(store)
    assert(rows(asOf) == rows(MergeSink.bucketedSnapshotAt(spark, store, 0L)))
    assert(rows(asOf) == Set((1L, "a", 10L), (k2, "b", 20L)))

    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "9").load(store).collect()
    }
  }

  test("timestampAsOf resolves to the newest commit at or before the timestamp") {
    val dir = Files.createTempDirectory("graft_dsv2_tsof").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)   // v0
    put(store, 1L, 2L, "a2", 1L)  // v1
    // stamp commit times explicitly (manifest mtime = commit clock)
    val t0 = 1700000000000L
    Seq(0L -> t0, 1L -> (t0 + 60000L)).foreach { case (v, t) =>
      Files.setLastModifiedTime(Paths.get(store, "_manifests", v.toString),
        java.nio.file.attribute.FileTime.fromMillis(t))
    }
    def at(ts: String) = rows(spark.read.format("graft")
      .option("timestampAsOf", ts).load(store))
    assert(at((t0 + 1000L).toString) == Set((1L, "a", 10L)),
      "between the commits -> v0")
    assert(at((t0 + 60000L).toString) == Set((1L, "a2", 20L)),
      "at the second commit -> v1")
    // before the first retained commit: loud refusal
    intercept[Exception] { at((t0 - 1L).toString) }
    // the two AS-OF options are mutually exclusive
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "0")
        .option("timestampAsOf", t0.toString).load(store).collect()
    }
  }

  test("timestampAsOf accepts the SAME grammar on a catalog-table read as on a path load") {
    val dir = Files.createTempDirectory("graft_dsv2_tsof_cat").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)   // v0
    put(store, 1L, 2L, "a2", 1L)  // v1
    val t0 = 1700000000000L
    Seq(0L -> t0, 1L -> (t0 + 60000L)).foreach { case (v, t) =>
      Files.setLastModifiedTime(Paths.get(store, "_manifests", v.toString),
        java.nio.file.attribute.FileTime.fromMillis(t))
    }
    val iso = java.time.Instant.ofEpochMilli(t0 + 1000L).toString
    // the provider's load-time parse accepted ISO-8601, but the same
    // option ALSO reaches GraftTable.newScanBuilder (whose read-time
    // parse runs FIRST) — which used only toLong/Timestamp.valueOf and
    // threw an unexplained IllegalArgumentException on the very string
    // the door advertises; both paths now share one parser
    assert(rows(spark.read.format("graft")
      .option("timestampAsOf", iso).load(store)) == Set((1L, "a", 10L)),
      "ISO-8601 timestampAsOf must resolve through the scan builder")
    assert(rows(spark.read.format("graft")
      .option("timestampAsOf", "2023-11-14 22:14:01").load(store))
      == Set((1L, "a", 10L)), "yyyy-MM-dd HH:mm:ss form too")
  }

  test("CREATE TABLE ... USING graft LOCATION: plain SQL over the store") {
    val dir = Files.createTempDirectory("graft_dsv2_sql").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    put(store, 2L, 2L, "b", 1L)
    spark.sql("DROP TABLE IF EXISTS obs")
    spark.sql(s"CREATE TABLE obs USING graft LOCATION '$store'")
    try {
      // the reference's declared interface: ad-hoc SQL over the
      // observation table (ssidentity.c:17-18)
      val agg = spark.sql(
        "SELECT count(*) AS n, sum(v) AS sv FROM obs WHERE v > 0").head()
      assert(agg.getLong(0) == 2L && agg.getLong(1) == 30L)
      // the table follows the store's HEAD, not its create-time state
      put(store, 3L, 3L, "c", 2L)
      assert(spark.sql("SELECT count(*) AS n FROM obs").head().getLong(0) == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS obs")
  }

  test("a catalog table follows the store's LIVE schema across an evolution") {
    import org.apache.spark.sql.types.{LongType, StructField}
    val dir = Files.createTempDirectory("graft_dsv2_catalog_evo").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    spark.sql("DROP TABLE IF EXISTS obs_evo")
    spark.sql(s"CREATE TABLE obs_evo USING graft LOCATION '$store'")
    try {
      assert(spark.table("obs_evo").columns.toSeq == Seq("k", "name", "v"))
      // evolve AFTER the catalog entry exists: the registry is the
      // source of truth, the catalog's stored schema is not consulted
      MergeSink.addColumns(store, Seq(StructField("score", LongType)))
      assert(spark.table("obs_evo").columns.toSeq ==
        Seq("k", "name", "v", "score"),
        "the table must serve the widened schema without re-creation")
      assert(spark.sql("SELECT score FROM obs_evo").collect()
        .forall(_.isNullAt(0)), "old rows null-backfill through the door")
    } finally spark.sql("DROP TABLE IF EXISTS obs_evo")
  }

  test("INSERT INTO / DataFrame append land as keyed MERGE upserts through the OCC protocol") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_insert").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    spark.sql("DROP TABLE IF EXISTS obs_w")
    spark.sql(s"CREATE TABLE obs_w USING graft LOCATION '$store'")
    try {
      // SQL INSERT: new key appends, existing key REPLACES (keyed upsert)
      spark.sql("INSERT INTO obs_w VALUES (2, 'b', 20), (1, 'a2', 11)")
      assert(rows(spark.table("obs_w")) == Set((1L, "a2", 11L), (2L, "b", 20L)))
      // the write is a REAL commit: history advanced, time travel sees
      // the pre-insert state
      assert(rows(spark.read.format("graft").option("versionAsOf", "0")
        .load(store)) == Set((1L, "a", 10L)))
      // DataFrame append through the same door
      Seq((3L, "c", 30L)).toDF("k", "name", "v")
        .write.format("graft").mode("append").save(store)
      assert(rows(spark.table("obs_w")).contains((3L, "c", 30L)))
      // duplicate keys within one INSERT: refused loudly (MERGE rule)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO obs_w VALUES (9, 'x', 1), (9, 'y', 2)")
      }
      assert(e.getMessage != null)
      assert(!rows(spark.table("obs_w")).exists(_._1 == 9L),
        "a refused INSERT must not partially apply")
      // INSERT OVERWRITE: refused (RESTORE/erasure are the destructive paths)
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE obs_w VALUES (9, 'x', 1)")
      }
    } finally spark.sql("DROP TABLE IF EXISTS obs_w")
  }

  test("DELETE FROM retracts at head through one CDC commit; history keeps the rows") {
    val dir = Files.createTempDirectory("graft_dsv2_delete").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    put(store, 2L, 2L, "b", 1L)
    put(store, 3L, 3L, "c", 2L)
    spark.sql("DROP TABLE IF EXISTS obs_d")
    spark.sql(s"CREATE TABLE obs_d USING graft LOCATION '$store'")
    try {
      val headBefore = MergeSink.latestVersion(store).get
      // arbitrary predicate, not just key equality
      spark.sql("DELETE FROM obs_d WHERE v >= 20")
      assert(rows(spark.table("obs_d")) == Set((1L, "a", 10L)),
        "matching rows retracted at head")
      // ONE commit, and history retains the deleted rows (head delete,
      // not erasure — eraseKeys is the history-destroying path)
      assert(MergeSink.latestVersion(store).contains(headBefore + 1))
      assert(rows(spark.read.format("graft")
        .option("versionAsOf", headBefore.toString).load(store))
        .map(_._1) == Set(1L, 2L, 3L))
      // a DELETE matching nothing commits nothing
      spark.sql("DELETE FROM obs_d WHERE v > 999")
      assert(MergeSink.latestVersion(store).contains(headBefore + 1))
    } finally spark.sql("DROP TABLE IF EXISTS obs_d")
  }

  test("pushed key filter prunes to the owning bucket — physically proven") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_prune").toString
    val store = s"$dir/store"
    val k2 = (2L to 64L).find(k => bucketOf(k) != bucketOf(1L)).get
    // v0 owns k1's bucket; v1 owns k2's bucket
    put(store, 1L, 1L, "a", 0L)
    put(store, k2, 2L, "b", 1L)
    // delete v0 (k1's bucket dir) OUT FROM UNDER the store: a read that
    // resolves only k2's bucket never notices; a full scan fails loudly
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().forEachRemaining(rmTree) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rmTree(Paths.get(store, "v0"))
    val table = spark.read.format("graft").load(store)
    assert(rows(table.filter(col("k") === k2)) == Set((k2, "b", 20L)),
      "key-equality read must scan only the owning bucket")
    assert(rows(table.filter(col("k").isin(k2))) == Set((k2, "b", 20L)),
      "IN-filter read must scan only the owning buckets")
    assert(rows(table.filter(col("k") === k2 && col("v") > 0L)) ==
      Set((k2, "b", 20L)), "pruning must survive conjunctions")
    intercept[Exception] { table.collect() } // full scan needs v0
    // and the pruned plan advertises itself
    val plan = table.filter(col("k") === k2).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Scan"),
      s"expected a scan node in:\n$plan")
  }

  test("column projection flows through the front door") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_prj").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    val projected = spark.read.format("graft").load(store).select("name")
    assert(projected.columns.toSeq == Seq("name"))
    assert(projected.as[String].collect().toSeq == Seq("a"))
    // count(*) — zero required columns — still answers
    assert(spark.read.format("graft").load(store).count() == 1L)
  }

  test("plain-protocol stores read through the same door") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_plain").toString
    val store = s"$dir/store"
    MergeSink.applyBatch(
      Seq((1L, "upsert", 1L, "a", 10L)).toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", vcols)
    MergeSink.applyBatch(
      Seq((1L, "upsert", 2L, "a2", 20L)).toDF("k", "op", "ver", "name", "v"),
      1L, store, "k", "op", "ver", vcols)
    assert(rows(spark.read.format("graft").load(store)) == Set((1L, "a2", 20L)))
    assert(rows(spark.read.format("graft").option("versionAsOf", "0")
      .load(store)) == Set((1L, "a", 10L)))
  }

  test("GraftCatalog: SQL-native VERSION AS OF / TIMESTAMP AS OF resolve through loadTable") {
    val dir = Files.createTempDirectory("graft_catalog").toString
    val store = s"$dir/obs"
    put(store, 1L, 1L, "a", 0L)   // v0
    put(store, 1L, 2L, "a2", 1L)  // v1
    val t0 = 1700000000000L
    Seq(0L -> t0, 1L -> (t0 + 60000L)).foreach { case (v, t) =>
      Files.setLastModifiedTime(Paths.get(store, "_manifests", v.toString),
        java.nio.file.attribute.FileTime.fromMillis(t))
    }
    spark.conf.set("spark.sql.catalog.gstore", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstore.warehouse", dir)
    try {
      assert(rows(spark.sql("SELECT * FROM gstore.obs")) ==
        Set((1L, "a2", 20L)))
      assert(rows(spark.sql("SELECT * FROM gstore.obs VERSION AS OF 0")) ==
        Set((1L, "a", 10L)), "SQL-native VERSION AS OF")
      val ts = new java.sql.Timestamp(t0 + 1000L)
        .toInstant.toString.replace("T", " ").stripSuffix("Z")
      assert(rows(spark.sql(
        s"SELECT * FROM gstore.obs TIMESTAMP AS OF '$ts'")) ==
        Set((1L, "a", 10L)), "SQL-native TIMESTAMP AS OF")
      // INSERT through the catalog identifier
      spark.sql("INSERT INTO gstore.obs VALUES (2, 'b', 20)")
      assert(rows(spark.sql("SELECT * FROM gstore.obs")) ==
        Set((1L, "a2", 20L), (2L, "b", 20L)))
      assert(spark.sql("SHOW TABLES IN gstore").collect()
        .map(_.getString(1)).toSet == Set("obs"))
      // identifiers are directory NAMES, never path expressions
      intercept[Exception] { spark.sql("SELECT * FROM gstore.`../obs`") }
      intercept[Exception] { spark.sql("SELECT * FROM gstore.`..`") }
      // lifecycle stays with the store's own tools
      intercept[Exception] { spark.sql("DROP TABLE gstore.obs") }
      val missing = intercept[Exception] {
        spark.sql("SELECT * FROM gstore.nope")
      }
      assert(missing.getMessage != null)
    } finally {
      spark.conf.unset("spark.sql.catalog.gstore")
      spark.conf.unset("spark.sql.catalog.gstore.warehouse")
    }
  }

  test("GraftCatalog: CREATE TABLE creates a store (empty v0); CTAS creates and fills; round-trips") {
    import graft.streaming.MergeSink
    val dir = Files.createTempDirectory("graft_catalog_create").toString
    spark.conf.set("spark.sql.catalog.gc2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc2.warehouse", dir)
    try {
      // CREATE TABLE with a column list: an empty v0 through the
      // normal claim protocol, key/nBuckets as table properties
      spark.sql("""CREATE TABLE gc2.fresh (k BIGINT, name STRING, v BIGINT)
        |TBLPROPERTIES (key = 'k', nBuckets = '8')""".stripMargin)
      val store = s"$dir/fresh"
      assert(MergeSink.latestVersion(store).contains(0L), "empty v0 committed")
      assert(MergeSink.storedNBuckets(store).contains(8L))
      assert(MergeSink.storedKeyName(store).contains("k"))
      assert(spark.sql("SELECT * FROM gc2.fresh").count() == 0,
        "a created store reads as an empty, typed table")
      // the SQL lifecycle continues without any Scala API
      spark.sql("INSERT INTO gc2.fresh VALUES (1, 'a', 10), (2, 'b', 20)")
      assert(rows(spark.sql("SELECT * FROM gc2.fresh")) ==
        Set((1L, "a", 10L), (2L, "b", 20L)))
      spark.sql("DELETE FROM gc2.fresh WHERE k = 2")
      assert(rows(spark.sql("SELECT * FROM gc2.fresh")) == Set((1L, "a", 10L)))
      assert(rows(spark.sql("SELECT * FROM gc2.fresh VERSION AS OF 1")) ==
        Set((1L, "a", 10L), (2L, "b", 20L)), "history starts at the INSERT")
      // CTAS: create + the V1Write INSERT path, one statement
      spark.sql("""CREATE TABLE gc2.ctas TBLPROPERTIES (nBuckets = '4')
        |AS SELECT k, name, v * 10 AS v10 FROM gc2.fresh""".stripMargin)
      assert(spark.sql("SELECT k, name, v10 FROM gc2.ctas").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
        Set((1L, "a", 100L)))
      assert(MergeSink.storedKeyName(s"$dir/ctas").contains("k"),
        "CTAS keys by the first column")
      // a data-bearing store still refuses DROP; double-create refused
      intercept[Exception] { spark.sql("DROP TABLE gc2.fresh") }
      intercept[Exception] {
        spark.sql("CREATE TABLE gc2.fresh2 (k BIGINT) USING graft") }
      // key must lead the schema — loud, not silent mis-keying
      val e = intercept[Exception] {
        spark.sql("""CREATE TABLE gc2.bad (a BIGINT, k BIGINT)
          |TBLPROPERTIES (key = 'k')""".stripMargin) }
      assert(e.getMessage.contains("FIRST"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gc2")
      spark.conf.unset("spark.sql.catalog.gc2.warehouse")
    }
  }

  test("writeStream.format(\"graft\"): the MERGE sink as a named streaming sink, exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_dsv2_sink").toString
    val store = s"$dir/store"
    val in = MemoryStream[(Long, String, Long, String, Long)]
    val q = in.toDF().toDF("k", "op", "ver", "name", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("key", "k").option("nBuckets", "4")
      .start(store)
    try {
      in.addData((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L))
      q.processAllAvailable()
      in.addData((1L, "upsert", 2L, "a2", 11L), (2L, "delete", 2L, null, 0L))
      q.processAllAvailable()
      // the stream-built store reads back through the same door,
      // last-writer-wins + deletes applied
      assert(rows(spark.read.format("graft").load(store)) ==
        Set((1L, "a2", 11L)))
      // ...with full history: the door's time travel sees batch 0
      assert(rows(spark.read.format("graft").option("versionAsOf", "0")
        .load(store)) == Set((1L, "a", 10L), (2L, "b", 20L)))
    } finally q.stop()
    // a restarted stream from the same checkpoint replays nothing:
    // the new MemoryStream's first two offsets sit BELOW the committed
    // offset, so their poison rows must be skipped outright, and only
    // the post-checkpoint offset applies (exactly-once end to end)
    val in2 = MemoryStream[(Long, String, Long, String, Long)]
    in2.addData((9L, "upsert", 9L, "POISON", 0L))
    in2.addData((9L, "upsert", 9L, "POISON", 0L))
    val q2 = in2.toDF().toDF("k", "op", "ver", "name", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("key", "k").option("nBuckets", "4")
      .start(store)
    try {
      in2.addData((3L, "upsert", 3L, "c", 30L))
      q2.processAllAvailable()
      assert(rows(spark.read.format("graft").load(store)) ==
        Set((1L, "a2", 11L), (3L, "c", 30L)),
        "committed offsets skip; only the new offset applies")
    } finally q2.stop()
  }

  test("TWO concurrent streams write ONE store via option(\"writer\") — the per-sensor-fleet shape") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_dsv2_twostreams").toString
    val store = s"$dir/store"
    def startStream(name: String, in: MemoryStream[(Long, String, Long, String, Long)]) =
      in.toDF().toDF("k", "op", "ver", "name", "v")
        .writeStream.format("graft")
        .option("checkpointLocation", s"$dir/ckpt_$name")
        .option("key", "k").option("nBuckets", "4")
        .option("writer", name) // OCC lineage per stream
        .start(store)
    val inA = MemoryStream[(Long, String, Long, String, Long)]
    val inB = MemoryStream[(Long, String, Long, String, Long)]
    val qA = startStream("fleetA", inA)
    val qB = startStream("fleetB", inB)
    try {
      // both fleets report concurrently, batch after batch
      (0 until 3).foreach { i =>
        inA.addData((100L + i, "upsert", 1L, s"a$i", i.toLong))
        inB.addData((200L + i, "upsert", 1L, s"b$i", i.toLong))
        qA.processAllAvailable()
        qB.processAllAvailable()
      }
      val got = rows(spark.read.format("graft").load(store))
      val want = (0 until 3).flatMap(i => Seq(
        (100L + i, s"a$i", i.toLong), (200L + i, s"b$i", i.toLong))).toSet
      assert(got == want, s"both fleets' rows must land: $got")
      // 6 commits, one linear history
      assert(MergeSink.latestVersion(store).contains(5L))
    } finally { qA.stop(); qB.stop() }
  }

  test("the store as a STREAM HUB: writeStream in, readStream out, one table in the middle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_dsv2_hub").toString
    val store = s"$dir/store"
    // upstream: CDC stream INTO the store through the named sink
    val in = MemoryStream[(Long, String, Long, String, Long)]
    val writer = in.toDF().toDF("k", "op", "ver", "name", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt_in")
      .option("key", "k").option("nBuckets", "4")
      .start(store)
    try {
      in.addData((1L, "upsert", 1L, "a", 10L))
      writer.processAllAvailable()
      // downstream: the change feed OUT of the same store, aggregated
      val seen = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, String)]()
      val reader = spark.readStream.format("graft")
        .option("startingVersion", "earliest").load(store)
        .writeStream.option("checkpointLocation", s"$dir/ckpt_out")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("k", "change").collect()
            .foreach(r => seen.add((r.getLong(0), r.getString(1)))): Unit
        }.start()
      try {
        reader.processAllAvailable()
        assert(seen.contains((1L, "insert")), s"bootstrap: $seen")
        // live end-to-end: upstream event -> store commit -> feed row
        in.addData((2L, "upsert", 2L, "b", 20L),
          (1L, "delete", 3L, null, 0L))
        writer.processAllAvailable()
        reader.processAllAvailable()
        import scala.jdk.CollectionConverters._
        assert(seen.asScala.toSet ==
          Set((1L, "insert"), (2L, "insert"), (1L, "delete")),
          s"the hub must relay every upstream change exactly once: $seen")
      } finally reader.stop()
    } finally writer.stop()
  }

  test("a racing SQL INSERT cannot fail the streaming sink — both writers land") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_dsv2_mixed").toString
    val store = s"$dir/store"
    // seed through a DISTINCT writer lineage: the plain `_lastBatch`
    // belongs to the streaming sink about to start at batchId 0 — a
    // store has ONE serialized replay lineage (that is its contract)
    MergeSink.applyBucketedBatchOcc(
      Seq((1L, "upsert", 1L, "seed", 10L)).toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4,
      writer = "seeder")
    val in = MemoryStream[(Long, String, Long, String, Long)]
    val q = in.toDF().toDF("k", "op", "ver", "name", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("key", "k").option("nBuckets", "4")
      .start(store)
    try {
      // ad-hoc SQL writers fire while the stream commits its batches:
      // the serialized sink retries lost claims, the OCC inserts yield
      // to in-flight serialized claims — nobody fails, nothing is lost
      val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
      val inserts = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 4).foreach { i =>
          Seq((100L + i, s"sql$i", 1L)).toDF("k", "name", "v")
            .write.format("graft").mode("append").save(store)
        }
      })
      (0 until 4).foreach { i =>
        in.addData((10L + i, "upsert", 1L, s"st$i", i.toLong))
        q.processAllAvailable()
      }
      inserts.get()
      pool.shutdown()
      q.processAllAvailable()
      val got = rows(spark.read.format("graft").load(store))
      val want = Set((1L, "seed", 10L)) ++
        (0 until 4).map(i => (10L + i, s"st$i", i.toLong)).toSet ++
        (0 until 4).map(i => (100L + i, s"sql$i", 1L)).toSet
      assert(got == want, s"every writer's rows must land: got $got")
    } finally q.stop()
  }

  test("readStream.format(\"graft\"): the change feed as a streaming source") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_stream").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    put(store, 2L, 2L, "b", 1L)
    // earliest: first delivery is the store's FULL STATE as inserts
    val feed = spark.readStream.format("graft")
      .option("startingVersion", "earliest").load(store)
    assert(feed.isStreaming)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("k", "change", "name_old", "name_new", "v_old", "v_new"))
    val q = feed.writeStream.format("memory").queryName("graft_feed")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      val boot = spark.table("graft_feed")
        .select("k", "change", "name_new").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(boot == Set((1L, "insert", "a"), (2L, "insert", "b")),
        "earliest bootstrap = full state as inserts")
      // a live commit arrives as an update diff
      put(store, 1L, 3L, "a3", 2L)
      q.processAllAvailable()
      val after = spark.table("graft_feed")
        .select("k", "change", "name_old", "name_new").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(after.contains((1L, "update", "a", "a3")),
        s"expected the v2→v3 update in $after")
      assert(after.size == 3, "exactly one new change row per commit")
    } finally q.stop()
  }

  test("a RESTARTED latest-mode feed catches up from its checkpoint, not from the restart-time head") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_feed_restart").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    def startFeed() = spark.readStream.format("graft").load(store)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("k", "change").collect()
          .foreach(r => seen.add((r.getLong(0), r.getString(1)))): Unit
      }.start()
    val q1 = startFeed()
    try {
      put(store, 2L, 2L, "b", 1L)
      q1.processAllAvailable()
      assert(seen.size == 1)
    } finally q1.stop()
    // the store moves on WHILE the stream is down...
    put(store, 3L, 3L, "c", 2L)
    put(store, 4L, 4L, "d", 3L)
    // ...and the restarted stream must deliver that gap IMMEDIATELY
    // (the original floor is pinned in the checkpoint; recomputing
    // "latest" at restart would silently hold the gap hostage until a
    // future commit — or forever, if writes stop)
    val q2 = startFeed()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet ==
        Set((2L, "insert"), (3L, "insert"), (4L, "insert")),
        s"the down-time gap must deliver on restart without new commits: $seen")
    } finally q2.stop()
  }

  test("a rate-limited feed restart never re-delivers committed ranges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_feed_pace").toString
    val store = s"$dir/store"
    (0 until 5).foreach(i => put(store, i.toLong + 1, 1L, s"r$i", i.toLong))
    // counts every delivered (k, change) INCLUDING duplicates — the
    // point is at-most-once per range across the restart
    val deliveries = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def startFeed() = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1")
      .load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("k").collect().foreach(r => deliveries.add(r.getLong(0))): Unit
      }.start()
    val q1 = startFeed()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = deliveries.size()
    assert(afterFirst == 5, s"bootstrap + 4 diffs deliver 5 keys: $deliveries")
    // restart with NOTHING new: pacing must resume at the persisted
    // watermark — re-pacing from the start floor would hand Spark an
    // available below the committed offset and re-run old ranges
    val q2 = startFeed()
    try {
      q2.processAllAvailable()
      assert(deliveries.size() == afterFirst,
        s"restart with no new commits must deliver NOTHING: $deliveries")
      // and new commits still flow
      put(store, 99L, 1L, "new", 5L)
      q2.processAllAvailable()
      assert(deliveries.size() == afterFirst + 1)
    } finally q2.stop()
  }

  test("readStream default startingVersion=latest delivers future changes only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_stream_latest").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    val q = spark.readStream.format("graft").load(store)
      .writeStream.format("memory").queryName("graft_feed_latest")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_feed_latest").count() == 0,
        "pre-subscription history must not deliver")
      put(store, 2L, 2L, "b", 1L)
      q.processAllAvailable()
      val got = spark.table("graft_feed_latest")
        .select("k", "change").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((2L, "insert")))
    } finally q.stop()
  }

  test("the scan reports REAL bytes: a dimension-sized store broadcasts in joins") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_stats").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    put(store, 2L, 2L, "b", 1L)
    val table = spark.read.format("graft").load(store)
    // the byte estimate itself: real parquet bytes, pruning-aware
    val full = MergeSink.scanBytes(store, None, None)
    assert(full.exists(b => b > 0 && b < 10L * 1024 * 1024),
      s"a 2-row store must estimate dimension-sized bytes: $full")
    val oneBucket = MergeSink.scanBytes(store, None,
      Some(Set(bucketOf(1L))))
    assert(oneBucket.exists(b => b > 0 && b <= full.get),
      s"a pruned estimate covers only the owning bucket: $oneBucket vs $full")
    // the V1 relation reports it (Spark's V1ScanWrapper does not yet
    // forward DSv2 statistics to the logical plan — see the scaladoc)
    val rel = new graft.sources.GraftRelation(spark.sqlContext, store, None,
      table.schema, None, Array.empty)
    assert(rel.sizeInBytes == full.get)
    // end to end: AQE's runtime re-planning sees the true sizes and
    // broadcasts the store side of the join
    val facts = spark.range(50000).select(col("id").as("k"),
      (col("id") * 2).as("fv"))
    val joined = facts.join(table, "k")
    assert(joined.count() == 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the store side broadcast:\n$plan")
  }

  test("Trigger.AvailableNow drains the feed to the START-CAPTURED head and terminates; restart resumes") {
    // VERDICT r14 #3: the backfill-then-stop consumer. The source
    // captures the head at query start (prepareForTriggerAvailableNow)
    // and drains to EXACTLY that version under the normal pacing — a
    // concurrent writer's mid-run commits wait for the next run, and a
    // restart from the same checkpoint resumes from the advanced
    // offset (exactly-once preserved).
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_availnow").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L) // v0
    put(store, 2L, 1L, "b", 1L) // v1
    put(store, 1L, 2L, "a2", 2L) // v2 (update)
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def drain(tag: String): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "earliest")
        .option("maxVersionsPerTrigger", "1") // paced: 3 ranges, not 1
        .load(store)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.select("k", "change").collect()
            .foreach(r => delivered.add((r.getLong(0), r.getString(1))))
          // the CONCURRENT WRITER: mid-first-run commit of v3 — the
          // run's captured head is v2, so k=3 must NOT appear this run
          if (tag == "first" && id == 0) put(store, 3L, 1L, "c", 3L)
          ()
        }
        .start()
      assert(q.awaitTermination(120000),
        s"AvailableNow run '$tag' must terminate by itself")
    }
    drain("first")
    val first = delivered.iterator().asScala.toList
    assert(first.toSet == Set((1L, "insert"), (2L, "insert"), (1L, "update")),
      s"first run must deliver exactly the start-head prefix: $first")
    delivered.clear()
    drain("second")
    val second = delivered.iterator().asScala.toList
    assert(second == List((3L, "insert")),
      s"restart must resume from the advanced offset: $second")
  }

  test("a running feed SURVIVES mid-stream schema evolution (start-schema projection); restart widens") {
    import org.apache.spark.sql.types.{LongType, StructField}
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_feed_evo").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[String], Set[(Long, String)])]()
    def startFeed() = spark.readStream.format("graft").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          batches.add((b.columns.toSeq, b.select("k", "change").collect()
            .map(r => (r.getLong(0), r.getString(1))).toSet)): Unit
      }.start()
    val startCols = Seq("k", "change", "name_old", "name_new", "v_old", "v_new")
    val q1 = startFeed()
    try {
      // the store EVOLVES while the subscriber runs...
      MergeSink.addColumns(store, Seq(StructField("score", LongType)))
      // ...and a post-evolution commit carries the new column
      MergeSink.applyBucketedBatch(
        Seq((2L, "upsert", 2L, "b", 20L, 5L))
          .toDF("k", "op", "ver", "name", "v", "score"),
        1L, store, "k", "op", "ver", Seq("name", "v", "score"), nBuckets = 4)
      // the stream must DELIVER, projected to its start schema — a
      // streaming source's shape is immutable for the query's life
      q1.processAllAvailable()
      val delivered = batches.asScala.toList
      assert(delivered.nonEmpty, "the post-evolution commit must deliver")
      assert(delivered.forall(_._1 == startCols),
        s"mid-stream deliveries keep the start schema: $delivered")
      assert(delivered.flatMap(_._2).contains((2L, "insert")))
    } finally q1.stop()
    // a RESTART re-resolves the schema: the feed now carries the
    // evolved column's change pairs
    batches.clear()
    val q2 = startFeed()
    try {
      put(store, 3L, 3L, "c", 2L)
      q2.processAllAvailable()
      val delivered = batches.asScala.toList
      assert(delivered.nonEmpty)
      assert(delivered.forall(_._1 ==
        startCols ++ Seq("score_old", "score_new")),
        s"the restarted feed must serve the widened shape: $delivered")
      assert(delivered.flatMap(_._2).contains((3L, "insert")))
    } finally q2.stop()
  }

  test("a running feed SURVIVES a mid-stream RENAME: real values deliver under the start name; restart adopts the new one") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_feed_rename").toString
    val store = s"$dir/store"
    put(store, 1L, 1L, "a", 0L)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[String], Set[(Long, String, String)])]()
    def startFeed(newCol: String) = spark.readStream.format("graft").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          batches.add((b.columns.toSeq,
            b.select("k", "change", newCol).collect()
              .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
              .toSet)): Unit
      }.start()
    val q1 = startFeed("name_new")
    try {
      q1.processAllAvailable() // drain the pre-rename range
      // the column RENAMES while the subscriber runs; a post-rename
      // commit carries values under the NEW logical name
      MergeSink.renameColumn(store, "name", "label")
      MergeSink.applyBucketedBatch(
        Seq((2L, "upsert", 2L, "b", 20L)).toDF("k", "op", "ver", "label", "v"),
        1L, store, "k", "op", "ver", Seq("label", "v"), nBuckets = 4)
      q1.processAllAvailable()
      val delivered = batches.asScala.toList
      assert(delivered.nonEmpty, "the post-rename commit must deliver")
      assert(delivered.forall(_._1 ==
        Seq("k", "change", "name_old", "name_new", "v_old", "v_new")),
        s"mid-stream deliveries keep the start shape: ${delivered.map(_._1)}")
      // the REAL value arrives under the start name — a rename is an
      // identity move, not a new column; null-withholding here would
      // be silent loss (ranges are never re-delivered)
      assert(delivered.flatMap(_._2).contains((2L, "insert", "b")),
        s"renamed column's values must deliver: ${delivered.flatMap(_._2)}")
    } finally q1.stop()
    // a restart re-resolves to the new logical name
    batches.clear()
    val q2 = startFeed("label_new")
    try {
      MergeSink.applyBucketedBatch(
        Seq((3L, "upsert", 3L, "c", 30L)).toDF("k", "op", "ver", "label", "v"),
        2L, store, "k", "op", "ver", Seq("label", "v"), nBuckets = 4)
      q2.processAllAvailable()
      val delivered = batches.asScala.toList
      assert(delivered.nonEmpty)
      assert(delivered.forall(_._1 ==
        Seq("k", "change", "label_old", "label_new", "v_old", "v_new")),
        s"the restarted feed must serve the renamed shape: ${delivered.map(_._1)}")
      assert(delivered.flatMap(_._2).contains((3L, "insert", "c")))
    } finally q2.stop()
  }
}
