package graft

import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.LongType

import graft.streaming.{FileStats, MergeSink}
import graft.streaming.FileStats.{ColStats, FileEntry}

/** MANIFEST-LEVEL DATA SKIPPING (VERDICT r14 #1/#8): per-file column
  * min/max + row counts recorded in `_stats/<version>` sidecars at
  * commit time, pruned in the snapshot plan BEFORE any footer read,
  * surfaced through DESCRIBE DETAIL and the scan's planner
  * statistics. The physical-skip proof uses the corrupted-file trick:
  * a file whose recorded range excludes the pushed predicate is
  * REPLACED with garbage bytes on disk — the pruned read stays
  * correct (the file was provably never opened), the unpruned read
  * fails loudly (the corruption is real). */
class FileSkippingSpec extends SparkTestBase {

  private lazy val s: SparkSession = {
    SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .master("local[2]")
      .appName("graft-file-skipping")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    sess.sparkContext.setLogLevel("ERROR")
    sess
  }

  /** `n` long keys routing to `bucket` under the store's own hash. */
  private def keysFor(bucket: Long, n: Int, nBuckets: Long): Seq[Long] =
    (1L to 100000L).iterator.filter(k =>
      MergeSink.bucketForInternalLiteral(k, LongType, nBuckets) == bucket)
      .take(n).toSeq

  test("canSkip: range/equality/null/string/composition semantics over recorded stats") {
    val e = FileEntry("f", 10, Map(
      "v" -> ColStats("l", "10", "20", 0, hasValues = true),
      "d" -> ColStats("d", "-0.0", "5.5", 2, hasValues = true),
      "sx" -> ColStats("s", "banana", "cherry", 0, hasValues = true),
      "alln" -> ColStats("l", "", "", 10, hasValues = false)))
    // integral ranges
    assert(FileStats.canSkip(e, GreaterThan("v", 20L)))
    assert(!FileStats.canSkip(e, GreaterThanOrEqual("v", 20L)))
    assert(FileStats.canSkip(e, GreaterThanOrEqual("v", 21L)))
    assert(FileStats.canSkip(e, LessThan("v", 10L)))
    assert(!FileStats.canSkip(e, LessThanOrEqual("v", 10L)))
    assert(FileStats.canSkip(e, EqualTo("v", 9L)))
    assert(!FileStats.canSkip(e, EqualTo("v", 15L)))
    assert(FileStats.canSkip(e, In("v", Array[Any](1L, 2L, 30L))))
    assert(!FileStats.canSkip(e, In("v", Array[Any](1L, 15L))))
    // int literal against a long-kind column still compares
    assert(FileStats.canSkip(e, EqualTo("v", Int.box(9))))
    // IEEE −0.0 == 0.0: min −0.0 must NOT exclude `= 0.0`
    assert(!FileStats.canSkip(e, EqualTo("d", 0.0)))
    assert(FileStats.canSkip(e, GreaterThan("d", 5.5)))
    assert(!FileStats.canSkip(e, EqualTo("d", Double.NaN)))
    // strings in UTF-8 binary order
    assert(FileStats.canSkip(e, EqualTo("sx", "apple")))
    assert(FileStats.canSkip(e, LessThan("sx", "banana")))
    assert(FileStats.canSkip(e, StringStartsWith("sx", "d")))
    assert(!FileStats.canSkip(e, StringStartsWith("sx", "ba")))
    // null bookkeeping
    assert(FileStats.canSkip(e, IsNull("v")))
    assert(!FileStats.canSkip(e, IsNull("d")))
    assert(FileStats.canSkip(e, EqualTo("alln", 5L)))
    assert(FileStats.canSkip(e, GreaterThan("alln", 5L)))
    assert(FileStats.canSkip(e, IsNotNull("alln")))
    assert(!FileStats.canSkip(e, IsNull("alln")))
    // composition: AND skips if either side does, OR only if both do
    assert(FileStats.canSkip(e,
      And(EqualTo("v", 9L), EqualTo("sx", "banana"))))
    assert(!FileStats.canSkip(e,
      Or(EqualTo("v", 15L), EqualTo("sx", "banana"))))
    assert(FileStats.canSkip(e,
      Or(EqualTo("v", 9L), EqualTo("sx", "apple"))))
    // conservative unknowns: unrecorded column, cross-domain literal
    assert(!FileStats.canSkip(e, EqualTo("zzz", 1L)))
    assert(!FileStats.canSkip(e, EqualTo("v", "10")))
    assert(!FileStats.canSkip(e, EqualTo("sx", 10L)))
    // sidecar round trip preserves entries exactly
    val tricky = FileEntry("_bucket=1/p a%r\nt.parquet", 3, Map(
      "col name" -> ColStats("s", "a b", "z\n?", 1, hasValues = true)))
    assert(FileStats.parse(FileStats.render(Seq(e, tricky)))
      .contains(Seq(tricky, e).sortBy(_.rel)))
  }

  test("a non-key range predicate physically skips files: corrupted excluded files are never opened") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_fileskip").toString
    val store = s"$dir/store"
    val nB = 4
    // two keys per bucket; per-bucket value ranges are disjoint:
    // bucket b holds v in [b*1000, b*1000+1]
    val rows = (0L until nB.toLong).flatMap { b =>
      keysFor(b, 2, nB).zipWithIndex.map { case (k, i) =>
        (k, "upsert", 1L, s"n$k", b * 1000L + i)
      }
    }
    assert(rows.size == nB * 2, "every bucket must be populated")
    MergeSink.applyBucketedBatch(rows.toDF("k", "op", "ver", "name", "v"),
      0L, store, "k", "op", "ver", Seq("name", "v"), nBuckets = nB)
    // the commit recorded the sidecar
    assert(JFiles.exists(JPaths.get(store, "_stats", "0")),
      "commit must record _stats/0")
    // corrupt every part file of buckets 0..2 (their v ranges < 3000)
    for (b <- 0 until 3) {
      val bd = JPaths.get(store, "v0", s"_bucket=$b")
      assert(JFiles.exists(bd), s"bucket $b dir must exist")
      val s0 = JFiles.list(bd)
      try s0.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => JFiles.write(p, Array[Byte](9, 9, 9, 9)))
      finally s0.close()
    }
    // pruned read: correct AND alive — the corrupted files' recorded
    // ranges exclude v >= 3000, so they are skipped pre-footer
    val got = s.read.format("graft").load(store)
      .filter($"v" >= 3000L).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == rows.filter(_._5 >= 3000L).map(t => (t._1, t._5)).toSet)
    // same through SQL, mixed with a residual predicate
    s.sql("DROP TABLE IF EXISTS skip_t")
    s.sql(s"CREATE TABLE skip_t USING graft LOCATION '$store'")
    try {
      val viaSql = s.sql(
        "SELECT k FROM skip_t WHERE v >= 3000 AND name LIKE 'n%'")
        .collect().map(_.getLong(0)).toSet
      assert(viaSql == rows.filter(_._5 >= 3000L).map(_._1).toSet)
    } finally s.sql("DROP TABLE IF EXISTS skip_t")
    // the corruption is REAL: an unpruned read must open them and fail
    intercept[Exception] {
      s.read.format("graft").load(store).collect()
    }
  }

  test("planner statistics report recorded row counts; DESCRIBE DETAIL surfaces per-bucket rows") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_fileskip_rows").toString
    val store = s"$dir/store"
    val nB = 2
    val ks = keysFor(0, 3, nB) ++ keysFor(1, 2, nB)
    MergeSink.applyBucketedBatch(
      ks.map(k => (k, "upsert", 1L, k * 10)).toDF("k", "op", "ver", "v"),
      0L, store, "k", "op", "ver", Seq("v"), nBuckets = nB)
    // the sidecar sums resolve driver-side first
    assert(MergeSink.scanRows(store, None, None).contains(ks.size.toLong),
      s"scanRows must be ${ks.size} (got ${MergeSink.scanRows(store, None, None)})")
    // logical-plan rowCount populated from the sidecar sums (VERDICT #8);
    // the optimizer's own GraftStatsRule must have installed the
    // forwarding wrapper (the swap is only real with class-aware
    // equality — a structurally-equal copy is dropped by transform)
    val op = s.read.format("graft").load(store).queryExecution.optimizedPlan
    op.collectLeaves().foreach {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        assert(r.scan.isInstanceOf[org.apache.spark.sql.graft.GraftStatsV1ScanWrapper],
          s"optimizer must install the stats wrapper (got ${r.scan.getClass.getName})")
      case other => fail(s"unexpected leaf ${other.getClass.getName}")
    }
    val stats = op.stats
    assert(stats.rowCount.exists(_.toLong == ks.size.toLong),
      s"rowCount must be ${ks.size} (got ${stats.rowCount})")
    // key-pruned scan: the SCAN LEAF's rowCount shrinks to the pruned
    // bucket's rows (the Filter node above it drops rowCount under the
    // size-only stats visitor — assert at the leaf, where the join
    // planner reads it)
    val oneKey = s.read.format("graft").load(store)
      .filter($"k" === ks.head)
      .queryExecution.optimizedPlan.collectLeaves().head.stats
    assert(oneKey.rowCount.exists(_.toLong == 3L),
      s"bucket-pruned rowCount must be 3 (got ${oneKey.rowCount})")
    // DESCRIBE DETAIL: per-bucket recorded rows
    val det = s.sql(s"DESCRIBE DETAIL '$store'").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(det == Map(0L -> 3L, 1L -> 2L), s"detail rows: $det")
  }

  test("date and timestamp ranges skip physically (TIMESTAMP_MICROS files)") {
    val sess = s
    import sess.implicits._
    // INT96 footer stats are unusable by design (kindOf refuses them);
    // pin the MICROS physical type so the `t` domain records
    val oldTs = s.conf.getOption("spark.sql.parquet.outputTimestampType")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val dir = JFiles.createTempDirectory("graft_fileskip_time").toString
      val store = s"$dir/store"
      val nB = 2
      def row(k: Long, day: String) = (k, "upsert", 1L,
        java.sql.Date.valueOf(day),
        java.sql.Timestamp.valueOf(s"$day 12:00:00"))
      // bucket 0 holds January, bucket 1 holds June
      val rows = keysFor(0, 2, nB).map(row(_, "2026-01-15")) ++
        keysFor(1, 2, nB).map(row(_, "2026-06-15"))
      MergeSink.applyBucketedBatch(rows.toDF("k", "op", "ver", "d", "ts"),
        0L, store, "k", "op", "ver", Seq("d", "ts"), nBuckets = nB)
      // corrupt the January file: any read that opens it fails loudly
      val bd = JPaths.get(store, "v0", "_bucket=0")
      val s0 = JFiles.list(bd)
      try s0.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => JFiles.write(p, Array[Byte](0, 0, 0)))
      finally s0.close()
      // date range: January provably excluded via the `dt` domain
      val byDate = s.read.format("graft").load(store)
        .filter($"d" >= org.apache.spark.sql.functions.lit(
          java.sql.Date.valueOf("2026-03-01")))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(byDate == keysFor(1, 2, nB).toSet, s"date skip: $byDate")
      // timestamp range: same files excluded via the `t` domain
      val byTs = s.read.format("graft").load(store)
        .filter($"ts" >= org.apache.spark.sql.functions.lit(
          java.sql.Timestamp.valueOf("2026-03-01 00:00:00")))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(byTs == keysFor(1, 2, nB).toSet, s"timestamp skip: $byTs")
      // the corruption is real
      intercept[Exception] {
        s.read.format("graft").load(store).collect()
      }
    } finally oldTs match {
      case Some(v) => s.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => s.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("runtime bloom probe lands on the graft fact side of a selective dim join") {
    // VERDICT r14 #2: a selective dim join over a graft-backed fact
    // table must not shuffle the full fact slice — Spark's
    // InjectRuntimeFilter plants a bloom `might_contain` built from
    // the dim's join keys as a PRE-SHUFFLE predicate above the store
    // scan (the V1 wrapper does not block the logical injection), so
    // non-matching fact rows die before the exchange. Local data is
    // tiny; the thresholds pin the 100 TB shape the optimizer must see.
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_fileskip_bloom").toString
    val store = s"$dir/store"
    val nB = 4
    val ks = (0L until nB.toLong).flatMap(b => keysFor(b, 25, nB))
    MergeSink.applyBucketedBatch(
      ks.map(k => (k, "upsert", 1L, k * 10)).toDF("k", "op", "ver", "v"),
      0L, store, "k", "op", "ver", Seq("v"), nBuckets = nB)
    // the dim must be FILE-backed: a local relation's filter constant-
    // folds away before the injection rule sees a selective predicate
    ks.map(k => (k, k % 10)).toDF("d_k", "d_class")
      .write.parquet(s"$dir/dim")
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val fact = s.read.format("graft").load(store)
      val dim = s.read.parquet(s"$dir/dim").filter($"d_class" === 3L)
      val j = fact.join(dim, $"k" === $"d_k")
      // the probe exists AND sits on the STORE side (a probe on the
      // dim side would protect the wrong scan)
      val probeSides = j.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.collectFirst {
              case _: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => ()
            }.isDefined =>
          f.child.collectLeaves().exists(
            _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation])
      }
      assert(probeSides.contains(true),
        s"expected a bloom might_contain probe above the graft scan in:\n" +
          j.queryExecution.optimizedPlan.toString.take(2500))
      val withBloom = j.collect().map(_.getLong(0)).sorted.toSeq
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = fact.join(dim, $"k" === $"d_k")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(withBloom == plain && withBloom.nonEmpty,
        "bloom-probed join must equal the plain join")
    } finally restore()
  }

  test("erasure refreshes the rewritten bucket's sidecar; vacuum reclaims dead sidecars") {
    val sess = s
    import sess.implicits._
    val dir = JFiles.createTempDirectory("graft_fileskip_erase").toString
    val store = s"$dir/store"
    val nB = 2
    val ks = keysFor(0, 3, nB)
    MergeSink.applyBucketedBatch(
      ks.map(k => (k, "upsert", 1L, k * 10)).toDF("k", "op", "ver", "v"),
      0L, store, "k", "op", "ver", Seq("v"), nBuckets = nB)
    // erase one key: bucket 0's dir rewrites IN PLACE with new file
    // names; the sidecar must refresh so counts stay exact
    MergeSink.eraseKeys(s, store, Seq(ks.head).toDF("k"))
    val det = s.sql(s"DESCRIBE DETAIL '$store'").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(det == Map(0L -> 2L), s"post-erasure detail rows: $det")
    val stats = s.read.format("graft").load(store)
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == 2L),
      s"post-erasure rowCount must be 2 (got ${stats.rowCount})")
    // a second batch moves bucket 0 to v3; vacuum reclaims v0's dir
    // AND its sidecar
    MergeSink.applyBucketedBatch(
      Seq((ks(1), "upsert", 2L, 999L)).toDF("k", "op", "ver", "v"),
      1L, store, "k", "op", "ver", Seq("v"), nBuckets = nB)
    val dead = MergeSink.vacuumBucketedStore(store)
    assert(dead.contains(0L), s"v0 must be reclaimable (got $dead)")
    assert(!JFiles.exists(JPaths.get(store, "_stats", "0")),
      "_stats/0 must be reclaimed with v0")
    assert(JFiles.exists(JPaths.get(store, "_stats",
      MergeSink.latestVersion(store).get.toString)),
      "the head's sidecar survives")
  }
}
