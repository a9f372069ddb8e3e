package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.streaming.MergeSink

/** UPDATE / MERGE INTO over graft stores (GraftDml): the last SQL DML
  * verbs, rewritten by the extension rule into one-CDC-batch OCC
  * commits. Needs a session with GraftExtensions — same pattern as
  * SqlFrontDoorSpec. */
class GraftDmlSpec extends SparkTestBase {

  private lazy val s: SparkSession = {
    SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dml")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    sess.sparkContext.setLogLevel("ERROR")
    sess
  }

  private def mkStore(dir: String): String = {
    val store = s"$dir/store"
    val sess = s
    import sess.implicits._
    MergeSink.applyBucketedBatch(
      Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L),
        (3L, "upsert", 1L, "c", 30L))
        .toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    store
  }

  private def rows(table: String) = s.sql(s"SELECT * FROM $table").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("UPDATE rewrites matching rows as one CDC commit; key reassignment refused") {
    val dir = Files.createTempDirectory("graft_dml_update").toString
    val store = mkStore(dir)
    s.sql("DROP TABLE IF EXISTS dml_u")
    s.sql(s"CREATE TABLE dml_u USING graft LOCATION '$store'")
    try {
      val head0 = MergeSink.latestVersion(store).get
      s.sql("UPDATE dml_u SET v = v + 100, name = concat(name, '!') WHERE k <= 2")
      assert(rows("dml_u") == Set((1L, "a!", 110L), (2L, "b!", 120L), (3L, "c", 30L)))
      // one commit; time travel sees the pre-UPDATE state
      assert(MergeSink.latestVersion(store).contains(head0 + 1))
      assert(MergeSink.bucketedSnapshotAt(s, store, head0)
        .filter("k = 1").select("v").head().getLong(0) == 10L)
      // no matches -> no commit
      s.sql("UPDATE dml_u SET v = 0 WHERE k > 999")
      assert(MergeSink.latestVersion(store).contains(head0 + 1))
      // the key column is identity, not data
      val e = intercept[Exception] { s.sql("UPDATE dml_u SET k = 9") }
      assert(e.getMessage.contains("key column"))
    } finally s.sql("DROP TABLE IF EXISTS dml_u")
  }

  test("MERGE INTO: three-arm semantics land as ONE atomic commit") {
    val dir = Files.createTempDirectory("graft_dml_merge").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq((2L, "B2", 200L), (9L, "I9", 900L), (3L, "DEL", 0L))
      .toDF("k", "name", "v").createOrReplaceTempView("dml_src")
    s.sql("DROP TABLE IF EXISTS dml_m")
    s.sql(s"CREATE TABLE dml_m USING graft LOCATION '$store'")
    try {
      val head0 = MergeSink.latestVersion(store).get
      s.sql("""MERGE INTO dml_m t USING dml_src s ON t.k = s.k
        |WHEN MATCHED AND s.name = 'DEL' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (s.k, s.name, s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN UPDATE SET v = t.v * 2
        |""".stripMargin)
      // k=1: not matched by source, doubled; k=2: updated from source;
      // k=3: matched the DELETE arm (first-action-wins); k=9: inserted
      assert(rows("dml_m") == Set((1L, "a", 20L), (2L, "B2", 200L), (9L, "I9", 900L)))
      assert(MergeSink.latestVersion(store).contains(head0 + 1),
        "all three arms must land as ONE commit")
      // multiple source rows per target key: the standard MERGE error
      Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "name", "v")
        .createOrReplaceTempView("dml_dup")
      val e = intercept[Exception] {
        s.sql("""MERGE INTO dml_m t USING dml_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(e.getMessage.contains("more than once"))
      assert(MergeSink.latestVersion(store).contains(head0 + 1),
        "a refused MERGE must not commit")
    } finally s.sql("DROP TABLE IF EXISTS dml_m")
  }

  test("UPDATE works across a schema evolution: assign the new column, others carry") {
    import org.apache.spark.sql.types.{LongType, StructField}
    val dir = Files.createTempDirectory("graft_dml_evo").toString
    val store = mkStore(dir)
    MergeSink.addColumns(store, Seq(StructField("score", LongType)))
    s.sql("DROP TABLE IF EXISTS dml_e")
    s.sql(s"CREATE TABLE dml_e USING graft LOCATION '$store'")
    try {
      s.sql("UPDATE dml_e SET score = v * 2 WHERE k <= 2")
      val got = s.sql("SELECT k, name, v, score FROM dml_e").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(got == Set((1L, "a", 10L, 20L), (2L, "b", 20L, 40L),
        (3L, "c", 30L, -1L)),
        s"evolved column assigned, untouched rows stay null-backfilled: $got")
    } finally s.sql("DROP TABLE IF EXISTS dml_e")
  }

  test("UPDATE with a subquery condition resolves inside the rewritten command") {
    val dir = Files.createTempDirectory("graft_dml_subq").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq(1L, 3L).toDF("sel").createOrReplaceTempView("dml_sel")
    s.sql("DROP TABLE IF EXISTS dml_sq")
    s.sql(s"CREATE TABLE dml_sq USING graft LOCATION '$store'")
    try {
      s.sql("UPDATE dml_sq SET v = -1 WHERE k IN (SELECT sel FROM dml_sel)")
      assert(rows("dml_sq") == Set((1L, "a", -1L), (2L, "b", 20L), (3L, "c", -1L)))
    } finally s.sql("DROP TABLE IF EXISTS dml_sq")
  }

  test("MERGE refuses to RE-KEY a row, but SET * (identity key assignment) works") {
    val dir = Files.createTempDirectory("graft_dml_rekey").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq((2L, "B2", 200L)).toDF("k", "name", "v")
      .createOrReplaceTempView("dml_rk_src")
    s.sql("DROP TABLE IF EXISTS dml_rk")
    s.sql(s"CREATE TABLE dml_rk USING graft LOCATION '$store'")
    try {
      val head0 = MergeSink.latestVersion(store).get
      // an UPDATE action assigning a DIFFERENT key: the same
      // "key column is immutable" refusal plain UPDATE raises —
      // previously this silently kept the old key while claiming success
      val e = intercept[Exception] {
        s.sql("""MERGE INTO dml_rk t USING dml_rk_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET k = t.k + 10, v = s.v""".stripMargin)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("key column")),
        s"expected the key-immutability error, got: $e")
      assert(MergeSink.latestVersion(store).contains(head0),
        "a refused MERGE must not commit")
      assert(rows("dml_rk") == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
      // SET * assigns the key too — under ON t.k = s.k it is an
      // identity assignment and must keep working
      s.sql("""MERGE INTO dml_rk t USING dml_rk_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(rows("dml_rk") == Set((1L, "a", 10L), (2L, "B2", 200L), (3L, "c", 30L)))
    } finally s.sql("DROP TABLE IF EXISTS dml_rk")
  }

  test("a duplicated NULL key trips the multiple-source-rows gate too") {
    val dir = Files.createTempDirectory("graft_dml_nulldup").toString
    val sess = s
    import sess.implicits._
    // a NULLABLE-key store (SQL DDL columns are nullable by default;
    // non-nullable stores already refuse a NULL key at the cast): the
    // gate below is the only thing standing between two NULL-keyed CDC
    // rows and a one-row-per-key store
    val store = s"$dir/store"
    val nullableSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("ver",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val seed = sess.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "upsert", 1L, "a", 10L),
      org.apache.spark.sql.Row(2L, "upsert", 1L, "b", 20L),
      org.apache.spark.sql.Row(3L, "upsert", 1L, "c", 30L)), nullableSchema)
    MergeSink.applyBucketedBatch(seed, 0L, store, "k", "op", "ver",
      Seq("name", "v"), nBuckets = 4)
    // two unmatched source rows both INSERTing key = NULL: groupBy
    // folds NULLs into one group, and the gate must flag it — an
    // ignoreNulls probe over the key alone would discard exactly the
    // NULL group and commit two rows for one (null) key
    Seq((100L, "x", 1L), (200L, "y", 2L)).toDF("sk", "name", "v")
      .createOrReplaceTempView("dml_null_src")
    s.sql("DROP TABLE IF EXISTS dml_nd")
    s.sql(s"CREATE TABLE dml_nd USING graft LOCATION '$store'")
    try {
      assert(s.table("dml_nd").schema("k").nullable,
        s"rig: the key must be nullable here (got ${s.table("dml_nd").schema})")
      val head0 = MergeSink.latestVersion(store).get
      val e = intercept[Exception] {
        s.sql("""MERGE INTO dml_nd t USING dml_null_src s ON t.k = s.sk
          |WHEN NOT MATCHED THEN INSERT (k, name, v)
          |VALUES (CAST(NULL AS BIGINT), s.name, s.v)""".stripMargin)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("more than")),
        s"expected the multiple-source-rows error, got: $e")
      assert(MergeSink.latestVersion(store).contains(head0),
        "a refused MERGE must not commit")
    } finally s.sql("DROP TABLE IF EXISTS dml_nd")
  }

  test("concurrent SQL INSERT statements serialize — neither adopts the other's claim") {
    val dir = Files.createTempDirectory("graft_dml_conc").toString
    val store = mkStore(dir)
    s.sql("DROP TABLE IF EXISTS dml_c")
    s.sql(s"CREATE TABLE dml_c USING graft LOCATION '$store'")
    try {
      // same-bucket keys force the statements onto overlapping claims:
      // before per-statement identities, both carried (writer=sql,
      // batchId=0) and each adopted the other's live claim — both then
      // overwrote ONE version dir and a row vanished
      def bucketOf(k: Long): Long = s.range(1)
        .select(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.lit(k)),
          org.apache.spark.sql.functions.lit(4L))).head().getLong(0)
      val base = 100L
      (0 until 3).foreach { rep =>
        val k1 = (base + rep * 200 until base + rep * 200 + 100)
          .find(k => bucketOf(k) == 0L).get
        val k2 = (k1 + 1 until k1 + 100).find(k => bucketOf(k) == 0L).get
        val head0 = MergeSink.latestVersion(store).get
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val threads = Seq(k1, k2).map { k =>
          new Thread(() =>
            try s.sql(s"INSERT INTO dml_c VALUES ($k, 'n$k', $k)")
            catch { case t: Throwable => errs.add(t) })
        }
        threads.foreach(_.start()); threads.foreach(_.join(120000))
        assert(errs.isEmpty, s"rep $rep: ${errs.asScala.toSeq}")
        val got = rows("dml_c")
        assert(got.contains((k1, s"n$k1", k1)) && got.contains((k2, s"n$k2", k2)),
          s"rep $rep: both inserts must land (got $got)")
        assert(MergeSink.latestVersion(store).contains(head0 + 2),
          s"rep $rep: two statements = two commits")
      }
    } finally s.sql("DROP TABLE IF EXISTS dml_c")
  }

  test("DML reads are bucket-pruned — physically proven by deleting an un-owning version dir") {
    val dir = Files.createTempDirectory("graft_dml_prune").toString
    val store = s"$dir/store"
    val sess = s
    import sess.implicits._
    def bucketOf(k: Long): Long = s.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit(k)),
        org.apache.spark.sql.functions.lit(4L))).head().getLong(0)
    val kA = 1L
    val kB = (2L to 99L).find(k => bucketOf(k) != bucketOf(kA)).get
    // two commits → the manifest references TWO version dirs, one per key
    MergeSink.applyBucketedBatch(
      Seq((kA, "upsert", 1L, "a", 10L)).toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    MergeSink.applyBucketedBatch(
      Seq((kB, "upsert", 1L, "b", 20L)).toDF("k", "op", "ver", "name", "v"),
      1L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    // poison kA's bucket: delete v0's data dir — ANY read that touches
    // it now fails loudly, so a DML that succeeds provably never read it
    val v0 = java.nio.file.Paths.get(store, "v0")
    Files.walk(v0).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    s.sql("DROP TABLE IF EXISTS dml_p")
    s.sql(s"CREATE TABLE dml_p USING graft LOCATION '$store'")
    try {
      intercept[Exception] { s.sql("SELECT * FROM dml_p").collect() }
      def readB() = s.sql(s"SELECT name, v FROM dml_p WHERE k = $kB").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // UPDATE with a literal key predicate: prunes to kB's bucket
      s.sql(s"UPDATE dml_p SET v = v + 1 WHERE k = $kB")
      assert(readB() == Set(("b", 21L)))
      // MERGE keyed on an equi conjunct: the source's keys bound the scan
      Seq((kB, "B!", 99L)).toDF("k", "name", "v")
        .createOrReplaceTempView("dml_p_src")
      s.sql("""MERGE INTO dml_p t USING dml_p_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (s.k, s.name, s.v)
        |""".stripMargin)
      assert(readB() == Set(("B!", 99L)))
      // DELETE with a literal key predicate
      s.sql(s"DELETE FROM dml_p WHERE k = $kB")
      assert(readB().isEmpty)
    } finally s.sql("DROP TABLE IF EXISTS dml_p")
  }

  test("cast-tolerant DML pruning: a coercion-upcast key predicate keeps the pruned read (deleted-unowned-dir proof)") {
    val dir = Files.createTempDirectory("graft_dml_castprune").toString
    val store = s"$dir/store"
    val sess = s
    import sess.implicits._
    def bucketOf(k: Int): Long = s.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit(k)),
        org.apache.spark.sql.functions.lit(4L))).head().getLong(0)
    val kA = 1
    val kB = (2 to 99).find(k => bucketOf(k) != bucketOf(kA)).get
    // INT key: a BIGINT literal in the predicate makes the analyzer
    // wrap the KEY side in CAST(k AS BIGINT) — the shape that used to
    // lose the pruning evidence
    MergeSink.applyBucketedBatch(
      Seq((kA, "upsert", 1L, 10L)).toDF("k", "op", "ver", "v"),
      0L, store, "k", "op", "ver", Seq("v"), nBuckets = 4)
    MergeSink.applyBucketedBatch(
      Seq((kB, "upsert", 1L, 20L)).toDF("k", "op", "ver", "v"),
      1L, store, "k", "op", "ver", Seq("v"), nBuckets = 4)
    val v0 = java.nio.file.Paths.get(store, "v0")
    Files.walk(v0).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    s.sql("DROP TABLE IF EXISTS dml_cp")
    s.sql(s"CREATE TABLE dml_cp USING graft LOCATION '$store'")
    try {
      intercept[Exception] { s.sql("SELECT * FROM dml_cp").collect() }
      // the coercion shape: k (INT) = <BIGINT literal> — succeeding
      // proves the poisoned dir was never read
      s.sql(s"UPDATE dml_cp SET v = v + 1 WHERE k = CAST($kB AS BIGINT)")
      val got = s.sql(s"SELECT v FROM dml_cp WHERE k = $kB").collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(21L), s"got $got")
      // IN with widened literals keeps the evidence too
      s.sql(s"DELETE FROM dml_cp WHERE k IN (CAST($kB AS BIGINT))")
      assert(s.sql(s"SELECT v FROM dml_cp WHERE k = $kB").collect().isEmpty)
    } finally s.sql("DROP TABLE IF EXISTS dml_cp")
  }

  test("DELETE accepts ANY condition in an extensions session — subqueries included") {
    val dir = Files.createTempDirectory("graft_dml_del").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq(1L, 3L).toDF("sel").createOrReplaceTempView("dml_del_sel")
    s.sql("DROP TABLE IF EXISTS dml_d")
    s.sql(s"CREATE TABLE dml_d USING graft LOCATION '$store'")
    try {
      val head0 = MergeSink.latestVersion(store).get
      // a subquery condition fails canDeleteWhere — the rewrite handles it
      s.sql("DELETE FROM dml_d WHERE k IN (SELECT sel FROM dml_del_sel)")
      assert(rows("dml_d") == Set((2L, "b", 20L)))
      assert(MergeSink.latestVersion(store).contains(head0 + 1),
        "one CDC commit")
      // history keeps the rows (HEAD delete, not erasure)
      assert(MergeSink.bucketedSnapshotAt(s, store, head0).count() == 3)
      // a correlated-aggregate condition too
      s.sql("INSERT INTO dml_d VALUES (7, 'z', 700)")
      s.sql("DELETE FROM dml_d WHERE v > (SELECT avg(v) FROM dml_d)")
      assert(rows("dml_d") == Set((2L, "b", 20L)))
      // no matches -> no commit
      val h = MergeSink.latestVersion(store).get
      s.sql("DELETE FROM dml_d WHERE k > 999")
      assert(MergeSink.latestVersion(store).contains(h))
    } finally s.sql("DROP TABLE IF EXISTS dml_d")
  }

  test("MERGE WITH SCHEMA EVOLUTION: one statement evolves the store through the GraftCatalog and commits the CDC batch") {
    val dir = Files.createTempDirectory("graft_dml_msev").toString
    val wh = s"$dir/wh"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/obs"))
    // the store lives under the warehouse so the catalog can name it
    val sess = s
    import sess.implicits._
    MergeSink.applyBucketedBatch(
      Seq((1L, "upsert", 1L, "a", 10L), (2L, "upsert", 1L, "b", 20L))
        .toDF("k", "op", "ver", "name", "v"),
      0L, s"$wh/obs", "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    s.conf.set("spark.sql.catalog.graftme", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftme.warehouse", wh)
    try {
      Seq((1L, 111L, "x1"), (9L, 999L, "x9"))
        .toDF("k", "v", "extra").createOrReplaceTempView("msev_src")
      val head0 = MergeSink.latestVersion(s"$wh/obs").get
      s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graftme.obs t
        |USING msev_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, extra = s.extra
        |WHEN NOT MATCHED THEN INSERT (k, v, extra) VALUES (s.k, s.v, s.extra)
        |""".stripMargin)
      // two commits: the metadata-only evolution, then the CDC batch
      assert(MergeSink.latestVersion(s"$wh/obs").contains(head0 + 2))
      val got = s.sql("SELECT k, name, v, extra FROM graftme.obs").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
          r.getLong(2), Option(r.getString(3)).getOrElse("-"))).toSet
      assert(got == Set((1L, "a", 111L, "x1"), (2L, "b", 20L, "-"),
        (9L, "-", 999L, "x9")), s"evolved MERGE result: $got")
      // the evolution commit is real store history: the pre-MERGE
      // read point still has the narrow schema
      assert(!MergeSink.bucketedSnapshotAt(s, s"$wh/obs", head0)
        .columns.contains("extra"))
      // the added column is stamped optional (graft.evolved): an
      // old-shape writer keeps committing without it
      MergeSink.applyBucketedBatch(
        Seq((3L, "upsert", 2L, "c", 30L)).toDF("k", "op", "ver", "name", "v"),
        1L, s"$wh/obs", "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
      assert(s.sql("SELECT extra FROM graftme.obs WHERE k = 3")
        .head().isNullAt(0))
    } finally {
      s.conf.unset("spark.sql.catalog.graftme")
      s.conf.unset("spark.sql.catalog.graftme.warehouse")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION on a session-catalog table is refused with the catalog remedy named") {
    val dir = Files.createTempDirectory("graft_dml_msev_refuse").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq((1L, 111L, "x1")).toDF("k", "v", "extra")
      .createOrReplaceTempView("msev_src2")
    s.sql("DROP TABLE IF EXISTS dml_msev")
    s.sql(s"CREATE TABLE dml_msev USING graft LOCATION '$store'")
    try {
      val e = intercept[Exception] {
        s.sql("""MERGE WITH SCHEMA EVOLUTION INTO dml_msev t
          |USING msev_src2 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(e.getMessage.contains("GraftCatalog") ||
        e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
    } finally s.sql("DROP TABLE IF EXISTS dml_msev")
  }

  test("store-scan statistics reach the STATIC planner: broadcast store-dim join with AQE off, no hint") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_dml_stats").toString
    val store = mkStore(dir)
    val oldAqe = s.conf.get("spark.sql.adaptive.enabled")
    val oldThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // 10 KB threshold: the 50k-row fact side is far ABOVE it, so the
    // ONLY way a BroadcastHashJoin appears is the STORE side's true
    // bytes reaching the static planner — the r14 form of this pin
    // passed with the FACT side broadcasting under the default 10 MB
    // threshold while the rule's swap was silently dropped by
    // transform()'s structural-equality check (FileSkippingSpec pins
    // the swap itself; this pins the planner consequence).
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    try {
      val table = s.read.format("graft").load(store)
      val facts = s.range(50000).select(col("id").as("k"),
        (col("id") * 2).as("fv"))
      val joined = facts.join(table, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("AdaptiveSparkPlan"), "AQE must be off for this pin")
      assert(plan.contains("BroadcastHashJoin"),
        s"the dim-sized store must broadcast at STATIC planning time " +
          s"(GraftStatsRule forwards the scan's true bytes):\n$plan")
      assert(joined.count() == 3)
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", oldAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
    }
  }

  // ---- DML file skipping (VERDICT r15 #1): the victim scan prunes
  // files through the `_stats` sidecars exactly like a SELECT — proven
  // physically with the FileSkippingSpec corrupted-file trick: a file
  // whose recorded range excludes the DML predicate is garbage on disk;
  // the pruned statement survives, the evidence-free twin trips.

  /** `n` long keys routing to `bucket` under the store's own hash. */
  private def keysFor(bucket: Long, n: Int, nBuckets: Long): Seq[Long] =
    (1L to 100000L).iterator.filter(k =>
      MergeSink.bucketForInternalLiteral(k,
        org.apache.spark.sql.types.LongType, nBuckets) == bucket)
      .take(n).toSeq

  /** 4-bucket store, 2 keys per bucket, bucket b holds v in
    * [b*1000, b*1000+1] — per-bucket value ranges are disjoint, so a
    * range predicate on v provably excludes whole files. */
  private def mkRangedStore(dir: String, sess: SparkSession): String = {
    import sess.implicits._
    val store = s"$dir/store"
    val rows = (0L until 4L).flatMap { b =>
      keysFor(b, 2, 4).zipWithIndex.map { case (k, i) =>
        (k, "upsert", 1L, s"n$k", b * 1000L + i)
      }
    }
    assert(rows.size == 8, "every bucket must be populated")
    MergeSink.applyBucketedBatch(rows.toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = 4)
    store
  }

  private def corruptBucket(store: String, b: Int): Unit = {
    val bd = java.nio.file.Paths.get(store, "v0", s"_bucket=$b")
    assert(Files.exists(bd), s"bucket $b dir must exist")
    val s0 = Files.list(bd)
    try s0.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .foreach(p => Files.write(p, Array[Byte](9, 9, 9, 9)))
    finally s0.close()
  }

  test("DELETE file-skips its victim scan (SupportsDelete door): corrupted excluded files never open") {
    val plain = SparkTestBase.session // no extensions: the DSv2 deleteWhere route
    val dir = Files.createTempDirectory("graft_dml_skipdel").toString
    val store = mkRangedStore(dir, plain)
    for (b <- 0 until 3) corruptBucket(store, b) // v < 3000 lives here
    // the evidence-free twin trips: without file-skipping filters the
    // victim scan opens a corrupted file — and nothing commits
    intercept[Exception] {
      MergeSink.sqlDelete(store,
        Seq(org.apache.spark.sql.functions.col("v") >= 3000L), None, Nil)
    }
    assert(MergeSink.latestVersion(store).contains(0L),
      "the failed twin must not have committed")
    plain.sql("DROP TABLE IF EXISTS dml_skip_d")
    plain.sql(s"CREATE TABLE dml_skip_d USING graft LOCATION '$store'")
    try {
      // the same DELETE through the SQL door passes its translated
      // filters as file-skipping evidence: buckets 0..2's recorded v
      // ranges exclude v >= 3000, so their corrupted files never open
      plain.sql("DELETE FROM dml_skip_d WHERE v >= 3000")
      assert(MergeSink.latestVersion(store).contains(1L),
        "the pruned DELETE must have committed")
      assert(plain.sql("SELECT k FROM dml_skip_d WHERE v >= 3000")
        .collect().isEmpty, "the matching rows must be retracted")
    } finally plain.sql("DROP TABLE IF EXISTS dml_skip_d")
  }

  test("UPDATE with key evidence file-skips INSIDE the pruned buckets (GraftDml route)") {
    val sess = s // extensions session: UPDATE rewrites through GraftDml
    val dir = Files.createTempDirectory("graft_dml_skipupd").toString
    val store = mkRangedStore(dir, sess)
    val kA = keysFor(3, 1, 4).head // bucket 3, v = 3000 (clean)
    val kB = keysFor(2, 1, 4).head // bucket 2, v = 2000 (corrupted below)
    corruptBucket(store, 2)
    s.sql("DROP TABLE IF EXISTS dml_skip_u")
    s.sql(s"CREATE TABLE dml_skip_u USING graft LOCATION '$store'")
    try {
      // key evidence prunes to buckets {2, 3}; the v-range conjunct
      // then FILE-prunes bucket 2's only file (recorded max v = 2001),
      // so the statement survives the corruption and updates kA only
      s.sql(s"UPDATE dml_skip_u SET v = v + 5 WHERE k IN ($kA, $kB) AND v >= 3000")
      assert(s.sql(s"SELECT v FROM dml_skip_u WHERE k = $kA")
        .head().getLong(0) == 3005L)
      val head1 = MergeSink.latestVersion(store).get
      // the twin WITHOUT a file-prunable conjunct reads bucket 2 and
      // trips on the real corruption — nothing commits
      intercept[Exception] {
        s.sql(s"UPDATE dml_skip_u SET v = v + 5 WHERE k IN ($kA, $kB)")
      }
      assert(MergeSink.latestVersion(store).contains(head1),
        "the tripped twin must not have committed")
    } finally s.sql("DROP TABLE IF EXISTS dml_skip_u")
  }

  test("MERGE with only a matched UPDATE arm leaves unmatched rows untouched") {
    val dir = Files.createTempDirectory("graft_dml_merge2").toString
    val store = mkStore(dir)
    val sess = s
    import sess.implicits._
    Seq((1L, 1000L)).toDF("k", "nv").createOrReplaceTempView("dml_src2")
    s.sql("DROP TABLE IF EXISTS dml_m2")
    s.sql(s"CREATE TABLE dml_m2 USING graft LOCATION '$store'")
    try {
      s.sql("""MERGE INTO dml_m2 t USING dml_src2 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      assert(rows("dml_m2") == Set((1L, "a", 1000L), (2L, "b", 20L), (3L, "c", 30L)))
    } finally s.sql("DROP TABLE IF EXISTS dml_m2")
  }
}
