package graft

import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.SparkSession

import graft.streaming.MergeSink

/** COLUMN MAPPING — metadata-only RENAME COLUMN (VERDICT r14 #4, the
  * Delta column-mapping pattern): the logical name moves in one
  * CAS-claimed schema commit while every data file keeps its stable
  * PHYSICAL column name. Proven here: zero data movement (file
  * identity), head reads under the new name, time travel keeps the
  * then-current name, post-rename writes / erasure / CDF / compaction
  * stay correct, the freed logical name is re-addable without a
  * physical collision, and the refusals (key column, existing name,
  * colliding batch evolution) fire loudly. */
class ColumnMappingSpec extends SparkTestBase {

  private lazy val s: SparkSession = {
    SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[2]")
      .appName("graft-column-mapping")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    sess.sparkContext.setLogLevel("ERROR")
    sess
  }

  /** All data files under the store's v* dirs with their mtimes —
    * the zero-movement witness. */
  private def fileIdentity(store: String): Map[String, Long] = {
    val root = JPaths.get(store)
    val s0 = JFiles.walk(root)
    try s0.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.contains("/v") &&
        p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        JFiles.getLastModifiedTime(p).toMillis).toMap
    finally s0.close()
  }

  private def put(store: String, rows: Seq[(Long, String, Long, String, Long)],
      batch: Long): Unit = {
    val sess = s
    import sess.implicits._
    MergeSink.applyBucketedBatch(
      rows.toDF("k", "op", "ver", "name", "v"),
      batch, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
  }

  test("RENAME COLUMN is metadata-only: file identity, new-name reads, time travel, writes, erasure, CDF, compaction") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_colmap").toString
    val store = s"$dir/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L)), 0L) // v0
    put(store, Seq((1L, "upsert", 2L, "a2", 11L)), 1L) // v1
    val before = fileIdentity(store)
    assert(before.nonEmpty)

    val renamed = MergeSink.renameColumn(store, "name", "label")
    assert(renamed == 2L)
    assert(fileIdentity(store) == before, "a rename must move ZERO data")

    // head reads under the NEW logical name, values untouched
    val head = s.read.format("graft").load(store)
    assert(head.columns.toSeq == Seq("k", "label", "v"))
    assert(head.select("k", "label", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "a2", 11L), (2L, "b", 20L)))
    // pushed predicates on the renamed column stay correct (the
    // file-stats sidecars record PHYSICAL names; the scan translates)
    assert(s.read.format("graft").load(store)
      .filter($"label" === "b").select("k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))

    // time travel BEFORE the rename keeps the then-current name
    val asOf = MergeSink.bucketedSnapshotAt(s, store, 1L)
    assert(asOf.columns.toSeq == Seq("k", "name", "v"))

    // writers at/after the rename speak the new logical name
    MergeSink.applyBucketedBatch(
      Seq((3L, "upsert", 1L, "c", 30L)).toDF("k", "op", "ver", "label", "v"),
      2L, store, "k", "op", "ver", Seq("label", "v"), nBuckets = 4)
    assert(s.read.format("graft").load(store).count() == 3)

    // the change feed's row shape follows the read point: label_old/_new
    val feed = MergeSink.storeChangesBetween(s, store, 0L,
      MergeSink.latestVersion(store).get)
    assert(feed.columns.toSeq ==
      Seq("k", "change", "label_old", "label_new", "v_old", "v_new"))
    val changes = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(changes == Set((1L, "update", "a2"), (3L, "insert", "c")),
      s"feed across the rename: ${changes.mkString(", ")}")

    // erasure still scrubs the subject across pre- and post-rename dirs
    assert(MergeSink.eraseKeys(s, store, Seq(1L).toDF("k")).isDefined)
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L)
      .filter($"k" === 1L).count() == 0, "erased from pre-rename history")

    // compaction rewrites under the stable PHYSICAL names; reads hold
    assert(MergeSink.compactBucketedStore(s, store).isDefined)
    val post = s.read.format("graft").load(store)
    assert(post.columns.toSeq == Seq("k", "label", "v"))
    assert(post.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "b"), (3L, "c")))
  }

  test("the freed logical name is re-addable: addColumns assigns a fresh physical name") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_colmap_readd").toString
    val store = s"$dir/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L)), 0L)
    MergeSink.renameColumn(store, "name", "label")
    // a BATCH re-using the freed physical name refuses with the remedy
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBucketedBatch(
        Seq((2L, "upsert", 1L, "x", "lx", 20L))
          .toDF("k", "op", "ver", "name", "label", "v"),
        1L, store, "k", "op", "ver", Seq("name", "label", "v"), nBuckets = 4)
    }
    assert(e.getMessage.contains("addColumns"), e.getMessage)
    // the metadata commit assigns a non-colliding physical name
    MergeSink.addColumns(store,
      Seq(org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val sc = MergeSink.snapshotSchemaAt(store, None)
    assert(sc.fieldNames.toSeq == Seq("k", "label", "v", "name"))
    val readded = sc.fields.find(_.name == "name").get
    assert(MergeSink.physicalName(readded) != "name",
      s"re-added 'name' must carry a fresh physical name " +
        s"(got ${MergeSink.physicalName(readded)})")
    // writes carrying BOTH columns land in the right places
    MergeSink.applyBucketedBatch(
      Seq((2L, "upsert", 1L, "lx", "nx", 20L))
        .toDF("k", "op", "ver", "label", "name", "v"),
      2L, store, "k", "op", "ver", Seq("label", "name", "v"), nBuckets = 4)
    val rows = s.read.format("graft").load(store)
      .select("k", "label", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "lx", Some("nx"))),
      s"label carries old+new data, re-added name only new: $rows")
  }

  test("DROP COLUMN is metadata-only: file identity, time travel, re-add with fresh physical, CDF, refusals") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_colmap_drop").toString
    val store = s"$dir/store"
    put(store, Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L)), 0L) // v0
    put(store, Seq((1L, "upsert", 2L, "a2", 11L)), 1L) // v1
    val before = fileIdentity(store)
    assert(before.nonEmpty)

    assert(MergeSink.dropColumn(store, "name") == 2L)
    assert(fileIdentity(store) == before, "a drop must move ZERO data")

    // head reads omit the column; remaining values untouched
    val head = s.read.format("graft").load(store)
    assert(head.columns.toSeq == Seq("k", "v"))
    assert(head.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 11L), (2L, 20L)))

    // time travel BEFORE the drop still shows the column WITH its data
    val asOf = MergeSink.bucketedSnapshotAt(s, store, 1L)
    assert(asOf.columns.toSeq == Seq("k", "name", "v"))
    assert(asOf.filter($"k" === 1L).head().getString(1) == "a2",
      "the dropped column's data must survive at old read points")

    // an old writer still supplying the dropped column is refused with
    // the re-add remedy (its physical name is retired)
    val eOld = intercept[IllegalArgumentException] {
      MergeSink.applyBucketedBatch(
        Seq((3L, "upsert", 1L, "c", 30L)).toDF("k", "op", "ver", "name", "v"),
        2L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    }
    assert(eOld.getMessage.contains("addColumns"), eOld.getMessage)

    // the freed LOGICAL name is re-addable with a FRESH physical name —
    // pre-drop rows read NULL, never the orphaned column's data
    MergeSink.addColumns(store,
      Seq(org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType))) // v3
    val sc = MergeSink.snapshotSchemaAt(store, None)
    assert(sc.fieldNames.toSeq == Seq("k", "v", "name"))
    val readded = sc.fields.find(_.name == "name").get
    assert(MergeSink.physicalName(readded) != "name",
      s"re-added 'name' must carry a fresh physical name " +
        s"(got ${MergeSink.physicalName(readded)})")
    val afterReadd = s.read.format("graft").load(store)
      .select("k", "name").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(afterReadd == Set((1L, None), (2L, None)),
      s"pre-drop rows must read NULL in the re-added column: $afterReadd")
    MergeSink.applyBucketedBatch(
      Seq((3L, "upsert", 1L, "c", 30L)).toDF("k", "op", "ver", "name", "v"),
      2L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4) // v4
    // the change feed across the drop boundary follows the read
    // point's schema (which includes the RE-ADDED name, ordered by the
    // last writer's declaration) — old rows null-fill
    val feed = MergeSink.storeChangesBetween(s, store, 0L,
      MergeSink.latestVersion(store).get)
    assert(feed.columns.toSeq ==
      Seq("k", "change", "name_old", "name_new", "v_old", "v_new"))
    val changes = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)))).toSet
    assert(changes == Set((1L, "update", None), (3L, "insert", Some("c"))),
      s"feed across the drop: ${changes.mkString(", ")}")

    // refusals: the key column, and a constraint-referenced column
    val eKey = intercept[IllegalArgumentException] {
      MergeSink.dropColumn(store, "k")
    }
    assert(eKey.getMessage.contains("KEY column"), eKey.getMessage)
    MergeSink.addConstraint(s, store, "v_pos", "v >= 0")
    val eCon = intercept[IllegalArgumentException] {
      MergeSink.dropColumn(store, "v")
    }
    assert(eCon.getMessage.contains("constraint"), eCon.getMessage)

    // compaction materializes the narrower schema (absorbing the
    // orphaned physical column); reads hold
    assert(MergeSink.compactBucketedStore(s, store).isDefined)
    val post = s.read.format("graft").load(store)
      .select("k", "name").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(post == Set((1L, None), (2L, None), (3L, Some("c"))))
  }

  test("SQL RENAME COLUMN via the catalog; refusals name their remedies") {
    val sess = s
    import sess.implicits._
    val wh = JFiles.createTempDirectory("graft_colmap_sql").toString
    put(s"$wh/store", Seq((1L, "upsert", 1L, "a", 10L)), 0L)
    s.conf.set("spark.sql.catalog.graftcm",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftcm.warehouse", wh)
    try {
      s.sql("ALTER TABLE graftcm.store RENAME COLUMN v TO score")
      assert(s.table("graftcm.store").columns.toSeq == Seq("k", "name", "score"))
      assert(s.sql("SELECT score FROM graftcm.store").head().getLong(0) == 10L)
      // chained rename keeps projecting the same physical column
      s.sql("ALTER TABLE graftcm.store RENAME COLUMN score TO points")
      assert(s.sql("SELECT points FROM graftcm.store").head().getLong(0) == 10L)
      // refusals: key column (rename AND drop), existing name
      val eKey = intercept[Exception] {
        s.sql("ALTER TABLE graftcm.store RENAME COLUMN k TO kk")
      }
      assert(eKey.getMessage.contains("KEY column"), eKey.getMessage)
      val eDup = intercept[Exception] {
        s.sql("ALTER TABLE graftcm.store RENAME COLUMN name TO points")
      }
      assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
      val eKeyDrop = intercept[Exception] {
        s.sql("ALTER TABLE graftcm.store DROP COLUMN k")
      }
      assert(eKeyDrop.getMessage.contains("KEY column"), eKeyDrop.getMessage)
      // DROP COLUMN is the metadata-only sibling: the column leaves
      // the schema through the catalog verb, the files stay
      s.sql("ALTER TABLE graftcm.store DROP COLUMN name")
      assert(s.table("graftcm.store").columns.toSeq == Seq("k", "points"))
      // a CHECK constraint pins the names it references: rename refuses
      s.sql("ALTER TABLE graftcm.store ADD CONSTRAINT pos CHECK (points >= 0)")
      val eCon = intercept[Exception] {
        s.sql("ALTER TABLE graftcm.store RENAME COLUMN points TO score2")
      }
      assert(eCon.getMessage.contains("constraint"), eCon.getMessage)
      s.sql("ALTER TABLE graftcm.store DROP CONSTRAINT pos")
      s.sql("ALTER TABLE graftcm.store RENAME COLUMN points TO score2")
      assert(s.sql("SELECT score2 FROM graftcm.store").head().getLong(0) == 10L)
    } finally {
      s.conf.unset("spark.sql.catalog.graftcm")
      s.conf.unset("spark.sql.catalog.graftcm.warehouse")
    }
  }
}
