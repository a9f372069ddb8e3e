package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.MergeSink

/** SQL maintenance verbs (GraftMaintenanceSql / GraftSqlParser): the
  * store-operator half of the SQL surface — DESCRIBE HISTORY,
  * OPTIMIZE [ZORDER BY], VACUUM [RETAIN …] [DRY RUN], RESTORE TABLE.
  * Needs a GraftExtensions session (the parser is injected); targets
  * resolve through a GraftCatalog or as quoted paths. */
class GraftMaintenanceSqlSpec extends SparkTestBase {

  private lazy val s: SparkSession = {
    SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[2]")
      .appName("graft-maintenance-sql")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    sess.sparkContext.setLogLevel("ERROR")
    sess
  }

  /** A store with a multi-version manifest: k1/k2 in different buckets,
    * then k1 rewritten — bucket(k2) still owned by v0. */
  private def mkStore(dir: String): String = {
    val store = s"$dir/store"
    val sess = s
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    import sess.implicits._
    def bucketOf(k: Long): Long = sess.range(1)
      .select(pmod(xxhash64(lit(k)), lit(4L))).head().getLong(0)
    val k2 = (2L to 64L).find(k => bucketOf(k) != bucketOf(1L)).get
    MergeSink.applyBucketedBatch(
      Seq((1L, "upsert", 1L, "a", 10L), (k2, "upsert", 1L, "b", 20L))
        .toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    MergeSink.applyBucketedBatch(
      Seq((1L, "upsert", 2L, "a2", 11L)).toDF("k", "op", "ver", "name", "v"),
      1L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    store
  }

  private def snap(store: String) =
    MergeSink.currentBucketedSnapshot(s, store).get
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("DESCRIBE HISTORY lists retained commits newest-first, via catalog and via path") {
    val wh = Files.createTempDirectory("graft_msql_hist").toString
    mkStore(wh)
    // identifier target through a registered GraftCatalog
    s.conf.set("spark.sql.catalog.graftm", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftm.warehouse", wh)
    try {
      val hist = s.sql("DESCRIBE HISTORY graftm.store").collect()
      assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 0L), "newest first")
      assert(hist.forall(_.getString(1) == "batch"))
      assert(hist.head.getBoolean(5), "head row flagged is_latest")
      // path target, same rows
      val byPath = s.sql(s"DESCRIBE HISTORY '$wh/store'").collect()
      assert(byPath.map(_.getLong(0)).toSeq == Seq(1L, 0L))
      // DESCRIBE DETAIL: one row per live bucket, with real bytes
      val detail = s.sql("DESCRIBE DETAIL graftm.store").collect()
      assert(detail.length == 2, "two live buckets (k1's and k2's)")
      assert(detail.forall(r => r.getLong(2) >= 1 && r.getLong(3) > 0),
        "every live bucket reports files and bytes")
    } finally {
      s.conf.unset("spark.sql.catalog.graftm")
      s.conf.unset("spark.sql.catalog.graftm.warehouse")
    }
  }

  test("OPTIMIZE compacts a multi-version store; content is bit-identical; ZORDER re-clusters") {
    val dir = Files.createTempDirectory("graft_msql_opt").toString
    val store = mkStore(dir)
    val before = snap(store)
    val compacted = s.sql(s"OPTIMIZE '$store'").collect()
    assert(compacted.map(_.getLong(0)).toSeq == Seq(2L),
      "compaction commits the next version")
    assert(snap(store) == before, "compaction is a layout change only")
    // already compact: plain OPTIMIZE no-ops (null row), ZORDER never does
    assert(s.sql(s"OPTIMIZE '$store'").collect().head.isNullAt(0))
    val z = s.sql(s"OPTIMIZE '$store' ZORDER BY (k, v)").collect()
    assert(z.map(_.getLong(0)).toSeq == Seq(3L))
    assert(snap(store) == before, "a clustered rewrite is a permutation")
    // single non-integral column clusters lexicographically
    assert(s.sql(s"OPTIMIZE '$store' ZORDER BY (name)").collect()
      .head.getLong(0) == 4L)
    // unknown column refused loudly
    val e = intercept[Exception] {
      s.sql(s"OPTIMIZE '$store' ZORDER BY (nope)").collect()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("VACUUM DRY RUN reports without touching; VACUUM reclaims; RETAIN holds read points") {
    val dir = Files.createTempDirectory("graft_msql_vac").toString
    val store = mkStore(dir)
    s.sql(s"OPTIMIZE '$store'") // v2 — makes v0/v1's dirs dead
    val dry = s.sql(s"VACUUM '$store' DRY RUN").collect().map(_.getLong(0)).toSet
    assert(dry == Set(0L, 1L), s"both superseded dirs reclaimable: $dry")
    assert(MergeSink.bucketedSnapshotAt(s, store, 0L).count() == 2,
      "DRY RUN must not reclaim anything")
    // retention: RETAIN 10 VERSIONS keeps every read point
    assert(s.sql(s"VACUUM '$store' RETAIN 10 VERSIONS").collect().isEmpty)
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L).count() == 2)
    // a bare VACUUM (no RETAIN clause) is refused — the SQL verb
    // demands the retention be stated before destroying history
    val bare = intercept[IllegalArgumentException] {
      s.sql(s"VACUUM '$store'").collect()
    }
    assert(bare.getMessage.contains("RETAIN"), bare.getMessage)
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L).count() == 2,
      "a refused VACUUM must not reclaim anything")
    // explicit zero retention: both reclaimed, old read point fails loudly
    val gone = s.sql(s"VACUUM '$store' RETAIN 0 VERSIONS").collect()
      .map(_.getLong(0)).toSet
    assert(gone == Set(0L, 1L))
    intercept[IllegalStateException] {
      MergeSink.bucketedSnapshotAt(s, store, 0L).count()
    }
    assert(snap(store).size == 2, "the head stays intact")
  }

  test("VACUUM routes plain-protocol stores (IVM views) to the version-count vacuum; head always survives") {
    val sess = s
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_msql_vacplain").toString
    val plain = s"$dir/view"
    // a plain-protocol store: applyBatch full snapshots, no manifests
    (0 until 5).foreach { i =>
      MergeSink.applyBatch(
        Seq((1L, "upsert", i.toLong + 1, s"n$i", i.toLong))
          .toDF("k", "op", "ver", "name", "v"),
        i.toLong, plain, "k", "op", "ver", Seq("name", "v"))
    }
    val dry = s.sql(s"VACUUM '$plain' DRY RUN").collect().map(_.getLong(0)).toSet
    assert(dry == Set(0L, 1L, 2L, 3L), s"reclaimable below the head: $dry")
    val gone = s.sql(s"VACUUM '$plain' RETAIN 2 VERSIONS").collect()
      .map(_.getLong(0)).toSet
    assert(gone == Set(0L, 1L, 2L))
    // the head (and the retained predecessor) still read
    assert(MergeSink.currentSnapshot(s, plain, "k", Seq("name", "v")).get
      .select("name").head().getString(0) == "n4")
    // hour-based retention has no commit-time source on a plain store
    val e = intercept[Exception] {
      s.sql(s"VACUUM '$plain' RETAIN 1 HOURS").collect()
    }
    assert(e.getMessage.contains("RETAIN n VERSIONS"), e.getMessage)
    // DESCRIBE HISTORY reads the plain store's surviving versions too
    val hist = s.sql(s"DESCRIBE HISTORY '$plain'").collect()
      .map(r => (r.getLong(0), r.getBoolean(5)))
    assert(hist.map(_._1).toSet == Set(3L, 4L), s"history: ${hist.toSeq}")
    assert(hist.find(_._2).map(_._1).contains(4L), "head flagged")
    // RETAIN 0 VERSIONS cannot be honored on a plain store (the head
    // dir is the only full snapshot) — REFUSED, never silently clamped
    val e0 = intercept[Exception] {
      s.sql(s"VACUUM '$plain' RETAIN 0 VERSIONS").collect()
    }
    assert(e0.getMessage.contains("retention floor is 1"), e0.getMessage)
    assert(MergeSink.currentSnapshot(s, plain, "k", Seq("name", "v")).get
      .select("name").head().getString(0) == "n4",
      "a refused plain VACUUM must not reclaim anything")
  }

  test("ADD/DROP CONSTRAINT verbs: commit-gated CHECK on the write path") {
    val sess = s
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_msql_constraint").toString
    val store = mkStore(dir) // k=1 name=a2 v=11 head; k2 name=b v=20
    val v = s.sql(s"ALTER TABLE '$store' ADD CONSTRAINT v_pos CHECK (v >= 0)")
      .head().getLong(0)
    assert(v == MergeSink.latestVersion(store).get, "activation is a commit")
    // a violating SQL INSERT refuses naming the constraint, atomically
    s.sql("DROP TABLE IF EXISTS con_t")
    s.sql(s"CREATE TABLE con_t USING graft LOCATION '$store'")
    try {
      val before = MergeSink.latestVersion(store).get
      val e = intercept[Exception] {
        s.sql("INSERT INTO con_t VALUES (77, 'neg', -5)")
      }
      assert(e.getMessage.contains("v_pos"), e.getMessage)
      assert(MergeSink.latestVersion(store).contains(before))
      // a violating UPDATE refuses too (DML routes through the gate)
      val e2 = intercept[Exception] {
        s.sql("UPDATE con_t SET v = -1 WHERE k = 1")
      }
      assert(e2.getMessage.contains("v_pos"), e2.getMessage)
      // compliant DML lands
      s.sql("UPDATE con_t SET v = 99 WHERE k = 1")
      assert(s.sql("SELECT v FROM con_t WHERE k = 1").head().getLong(0) == 99L)
      // an ADD against violating existing data refuses with the row
      val e3 = intercept[Exception] {
        s.sql(s"ALTER TABLE '$store' ADD CONSTRAINT tight CHECK (v < 50)")
      }
      assert(e3.getMessage.contains("existing row"), e3.getMessage)
      // DROP CONSTRAINT deactivates (a history-visible commit)
      s.sql(s"ALTER TABLE '$store' DROP CONSTRAINT v_pos")
      s.sql("INSERT INTO con_t VALUES (77, 'neg', -5)")
      assert(s.sql("SELECT v FROM con_t WHERE k = 77").head().getLong(0) == -5L)
      // unknown name refuses with the inventory
      val e4 = intercept[Exception] {
        s.sql(s"ALTER TABLE '$store' DROP CONSTRAINT nope")
      }
      assert(e4.getMessage.contains("no constraint"), e4.getMessage)
    } finally s.sql("DROP TABLE IF EXISTS con_t")
  }

  test("CONVERT resumes a pre-swap crash: breadcrumb present, v0 residue, no head") {
    val sess = s
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_msql_convresume").toString
    val plain = s"$dir/plain"
    Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("name", "k", "v").write.parquet(plain)
    val p = java.nio.file.Paths.get(plain)
    // the crashed attempt's breadcrumb: the original top-level names,
    // recorded before anything was written (data files + job markers)
    val s0 = java.nio.file.Files.list(p)
    val originals =
      try s0.toArray.map(_.toString.split('/').last)
        .filter(n => (!n.startsWith("_") && !n.startsWith(".")) ||
          n == "_SUCCESS").sorted
      finally s0.close()
    java.nio.file.Files.write(p.resolve("_convert"),
      originals.mkString("\n").getBytes("UTF-8"))
    // the crashed attempt's residue: a published-but-unswapped v0
    // (stale content the resume must replace) and its slot-0 manifest
    // — and NO `_latest` (the crash hit before the pointer swap)
    java.nio.file.Files.createDirectories(p.resolve("v0").resolve("_bucket=0"))
    java.nio.file.Files.write(
      p.resolve("v0").resolve("_bucket=0").resolve("stale.bin"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectories(p.resolve("_manifests"))
    java.nio.file.Files.write(p.resolve("_manifests").resolve("0"),
      "#nbuckets 4\n0 0".getBytes("UTF-8"))
    // re-running the same CONVERT resumes instead of refusing with the
    // misleading flat-directory message
    val converted = s.sql(s"CONVERT TO GRAFT '$plain' KEY (k) NBUCKETS 4")
      .head().getLong(0)
    assert(converted == 0L)
    val got = MergeSink.currentBucketedSnapshot(s, plain).get
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)),
      s"resumed conversion must re-publish over the stale v0: $got")
    // originals swept, breadcrumb gone, stale residue replaced
    assert(!java.nio.file.Files.exists(p.resolve("_convert")))
    assert(!java.nio.file.Files.exists(
      p.resolve("v0").resolve("_bucket=0").resolve("stale.bin")))
    val s1 = java.nio.file.Files.list(p)
    val loose =
      try s1.toArray.map(_.toString.split('/').last)
        .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
          !n.startsWith("v"))
      finally s1.close()
    assert(loose.isEmpty, s"originals must be swept: ${loose.mkString(", ")}")
  }

  test("RESTORE TABLE TO VERSION AS OF rolls the head back as a new commit") {
    val dir = Files.createTempDirectory("graft_msql_restore").toString
    val store = mkStore(dir)
    val before = MergeSink.bucketedSnapshotAt(s, store, 0L)
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val restored = s.sql(s"RESTORE TABLE '$store' TO VERSION AS OF 0").collect()
    assert(restored.head.getLong(0) == 0L && restored.head.getLong(1) == 2L)
    assert(snap(store) == before, "head == the restore point's state")
    // and the rolled-over history is still readable (restore is a commit)
    assert(MergeSink.bucketedSnapshotAt(s, store, 1L)
      .filter("k = 1").select("name").head().getString(0) == "a2")
  }

  test("CREATE TABLE ... SHALLOW CLONE branches zero-copy; branch and source evolve independently") {
    val wh = Files.createTempDirectory("graft_msql_clone").toString
    val store = mkStore(wh)
    s.conf.set("spark.sql.catalog.graftc", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftc.warehouse", wh)
    try {
      val point = s.sql("CREATE TABLE graftc.branch SHALLOW CLONE graftc.store")
        .collect().head.getLong(0)
      assert(point == 1L, "branch head = the source's clone point")
      val branch = s"$wh/branch"
      assert(snap(branch) == snap(store), "the branch reads the clone point")
      // independent evolution: a branch commit is invisible to the source
      val sess = s
      import sess.implicits._
      MergeSink.applyBucketedBatch(
        Seq((99L, "upsert", 9L, "z", 90L)).toDF("k", "op", "ver", "name", "v"),
        0L, branch, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
      assert(snap(branch).contains((99L, "z", 90L)))
      assert(!snap(store).contains((99L, "z", 90L)))
      // the pin holds the source's vacuum off the clone point's dirs
      assert(MergeSink.releaseClone(store, branch),
        "the clone registered a pin with its source")
    } finally {
      s.conf.unset("spark.sql.catalog.graftc")
      s.conf.unset("spark.sql.catalog.graftc.warehouse")
    }
  }

  test("ALTER TABLE ADD COLUMNS routes to the store's metadata-only evolution") {
    val wh = Files.createTempDirectory("graft_msql_alter").toString
    mkStore(wh)
    s.conf.set("spark.sql.catalog.grafta", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.grafta.warehouse", wh)
    try {
      s.sql("ALTER TABLE grafta.store ADD COLUMNS (score BIGINT)")
      assert(s.table("grafta.store").columns.toSeq ==
        Seq("k", "name", "v", "score"))
      assert(s.sql("SELECT score FROM grafta.store").collect()
        .forall(_.isNullAt(0)), "old rows null-backfill")
      // the evolution is a COMMIT: time travel keeps the old shape
      assert(s.sql("SELECT * FROM grafta.store VERSION AS OF 1").columns.toSeq ==
        Seq("k", "name", "v"))
      // DROP COLUMN is the metadata-only sibling since r16; retyping
      // stays refused (a type change rewrites the store)
      s.sql("ALTER TABLE grafta.store DROP COLUMN score")
      assert(s.table("grafta.store").columns.toSeq == Seq("k", "name", "v"))
      val e = intercept[Exception] {
        s.sql("ALTER TABLE grafta.store ALTER COLUMN v TYPE STRING")
      }
      assert(e.getMessage.contains("ADD COLUMNS") ||
        e.getMessage.contains("retyping"), e.getMessage)
      // table properties surface the registry facts
      val props = s.sql("SHOW TBLPROPERTIES grafta.store").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("key").contains("k"))
      assert(props.get("nBuckets").contains("4"))
      assert(props.get("latestVersion").contains("3")) // v3 = the DROP
    } finally {
      s.conf.unset("spark.sql.catalog.grafta")
      s.conf.unset("spark.sql.catalog.grafta.warehouse")
    }
  }

  test("OPTIMIZE WHERE compacts only the named key's bucket; non-literal shapes and WHERE+ZORDER refuse") {
    val sess = s
    import sess.implicits._
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val dir = Files.createTempDirectory("graft_msql_optwhere").toString
    val store = s"$dir/store"
    def bucketOf(k: Long): Long = sess.range(1)
      .select(pmod(xxhash64(lit(k)), lit(4L))).head().getLong(0)
    val kA = 1L
    val kB = (2L to 99L).find(k => bucketOf(k) != bucketOf(kA)).get
    MergeSink.applyBucketedBatch(
      Seq((kA, "upsert", 1L, "a", 10L)).toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    MergeSink.applyBucketedBatch(
      Seq((kB, "upsert", 1L, "b", 20L)).toDF("k", "op", "ver", "name", "v"),
      1L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    val ownersBefore = MergeSink.storeStats(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // scoped: only kA's bucket moves to the new version (widened
    // literal exercises the TRY-cast normalization too)
    val v = s.sql(s"OPTIMIZE '$store' WHERE k = CAST($kA AS INT)")
      .head().getLong(0)
    val ownersAfter = MergeSink.storeStats(s, store).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ownersAfter(bucketOf(kA)) == v, s"$ownersAfter")
    assert(ownersAfter(bucketOf(kB)) == ownersBefore(bucketOf(kB)),
      "the un-named key's bucket must keep its owner")
    assert(snap(store) == Set((kA, "a", 10L), (kB, "b", 20L)))
    // refusals: non-literal shapes, and WHERE with ZORDER BY
    val e1 = intercept[Exception] {
      s.sql(s"OPTIMIZE '$store' WHERE v > 5").collect()
    }
    assert(e1.getMessage.contains("literal predicates on the key"), e1.getMessage)
    val e2 = intercept[Exception] {
      s.sql(s"OPTIMIZE '$store' WHERE k = $kA ZORDER BY (v)").collect()
    }
    assert(e2.getMessage.contains("mutually exclusive"), e2.getMessage)
  }

  test("CONVERT TO GRAFT adopts a flat parquet dir in place: store verbs work, originals swept, re-convert refused") {
    val sess = s
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_msql_convert").toString
    val plain = s"$dir/plain"
    // a plain parquet table from some non-graft producer, with the
    // key deliberately NOT first (CONVERT reorders it to the front)
    Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("name", "k", "v")
      .write.parquet(plain)
    val converted = s.sql(s"CONVERT TO GRAFT '$plain' KEY (k) NBUCKETS 4")
      .head().getLong(0)
    assert(converted == 0L)
    // loose originals swept; the dir is now a store
    val loose = java.nio.file.Files.list(java.nio.file.Paths.get(plain))
      .toArray.map(_.toString.split('/').last)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") && !n.startsWith("v"))
    assert(loose.isEmpty, s"originals must be swept: ${loose.mkString(", ")}")
    // every store verb works on the converted dir; key-first snapshot
    val got = MergeSink.currentBucketedSnapshot(s, plain).get
      .select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    s.sql("DROP TABLE IF EXISTS conv_t")
    s.sql(s"CREATE TABLE conv_t USING graft LOCATION '$plain'")
    try {
      s.sql("DELETE FROM conv_t WHERE k = 2")
      assert(s.sql("SELECT k FROM conv_t").collect().map(_.getLong(0)).toSet ==
        Set(1L, 3L))
      // time travel back to the conversion commit
      assert(MergeSink.bucketedSnapshotAt(s, plain, 0L).count() == 3)
      assert(s.sql(s"DESCRIBE HISTORY '$plain'").collect().length == 2)
    } finally s.sql("DROP TABLE IF EXISTS conv_t")
    // a directory that is already a store refuses
    val e = intercept[IllegalStateException] {
      s.sql(s"CONVERT TO GRAFT '$plain' KEY (k)").collect()
    }
    assert(e.getMessage.contains("already a committed store"), e.getMessage)
    // duplicate keys refuse with a sample named
    val dupDir = s"$dir/dup"
    Seq((1L, 10L), (1L, 20L)).toDF("k", "v").write.parquet(dupDir)
    val e2 = intercept[IllegalArgumentException] {
      s.sql(s"CONVERT TO GRAFT '$dupDir' KEY (k) NBUCKETS 4").collect()
    }
    assert(e2.getMessage.contains("more than once"), e2.getMessage)
  }

  test("interception is claim-checked: foreign targets and look-alike statements delegate verbatim") {
    assert(s.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
    assert(s.range(3).count() == 3)
    val parser = s.sessionState.sqlParser
    // a table literally named `history`: DESCRIBE must stay vanilla
    // (DescribeColumn/Relation from the delegate, never our command)
    val desc = parser.parsePlan("DESCRIBE history some_col")
    assert(!desc.getClass.getName.contains("Graft"), desc.getClass.getName)
    // a CTAS whose QUERY merely contains the words: stays a CTAS
    val ctas = parser.parsePlan(
      "CREATE TABLE sct AS SELECT 'a SHALLOW CLONE b' AS c")
    assert(!ctas.getClass.getName.contains("Graft"), ctas.getClass.getName)
    // non-graft-catalog identifiers delegate: vanilla Spark has no
    // OPTIMIZE/VACUUM, so the pre-extension ParseException comes back
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      parser.parsePlan("OPTIMIZE not_a_catalog.obs")
    }
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      parser.parsePlan("VACUUM bare_name")
    }
    // quoted paths are unambiguous and stay ours
    assert(parser.parsePlan("VACUUM '/tmp/x' DRY RUN")
      .getClass.getName.contains("GraftVacuumCommand"))
  }
}
