package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Snapshot

/** ST10 — streaming MERGE sink: each micro-batch of CDC rows
  * (key, op ∈ {upsert, delete}, version, values…) applies to a keyed
  * parquet snapshot via [[Snapshot.applyChanges]] — the LIVE form of
  * T8, turning a changelog stream into an always-current store the way
  * a table format's MERGE INTO would, built from primitives.
  *
  * Durability protocol (exactly-once effect under replay): every batch
  * writes a FULL new snapshot to `storeDir/v<batchId>` and then swaps
  * the `_latest` pointer (atomic move of a one-line file). A crash
  * between write and swap replays the batch against the OLD snapshot —
  * same output; a crash between swap and the checkpoint commit replays
  * it against the NEW one — and [[Snapshot.applyChanges]] is
  * IDEMPOTENT (re-upserting identical values and re-deleting absent
  * keys are both no-ops), so the store converges either way. SinkSpec
  * replays both interleavings.
  *
  * Scale posture: snapshot-replace is the local-parquet stand-in for a
  * table format's transactional MERGE; the operator underneath (winner
  * reduction + one co-partitioned full outer join) is exactly what a
  * partition-aware writer would keep, rewriting only touched
  * partitions instead of `v<n>` directories.
  */
object MergeSink {

  private def latestPath(storeDir: String) = Paths.get(storeDir, "_latest")
  private def commitsDir(storeDir: String) = Paths.get(storeDir, "_commits")

  /** Concurrent-writer guard (CAS via exclusive marker creation): a
    * version is only allowed to swap `_latest` after durably claiming
    * `_commits/<version>` (content = the parent version it derived
    * from; `Files.write(CREATE_NEW)` is atomic-exclusive) and then
    * verifying no OTHER writer committed a version past that parent.
    * Linearize on marker-creation order: the later creator always sees
    * the earlier marker and fails; the earlier creator either passes
    * (winner) or — if its check ran after the later marker appeared —
    * also fails (zero winners, both loud, retry-able). A silent lost
    * update (two writers deriving from the same parent, the second
    * swap clobbering the first's changes) is thereby impossible.
    * Markers are immutable history; a marker matching our (version,
    * parent) is OUR crash-replay and passes through. Throws
    * [[java.util.ConcurrentModificationException]] on a detected race. */
  private def claimCommit(storeDir: String, version: Long, parent: Long): Unit = {
    val dir = commitsDir(storeDir)
    Files.createDirectories(dir)
    val marker = dir.resolve(version.toString)
    try Files.write(marker, parent.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    catch { case _: FileAlreadyExistsException =>
      val prev = new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim.toLong
      if (prev != parent)
        throw new java.util.ConcurrentModificationException(
          s"MergeSink: version $version of $storeDir was already committed " +
            s"against parent v$prev, but this writer derived it from v$parent " +
            "— a second writer is racing on this store")
    }
    val others = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .flatMap(n => n.toLongOption).filter(v => v > parent && v != version)
        .toList.sorted
      finally s.close()
    }
    if (others.nonEmpty) {
      Files.deleteIfExists(marker) // withdraw so the racing winner can proceed
      throw new java.util.ConcurrentModificationException(
        s"MergeSink: version${if (others.size > 1) "s" else ""} " +
          s"${others.mkString(", ")} committed to $storeDir after this " +
          s"writer read parent v$parent — refusing to swap v$version over " +
          "changes it never saw (lost update); re-read the store and retry")
    }
  }

  /** The store's current contents (empty-but-typed before any batch). */
  def currentSnapshot(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, key: String, valueCols: Seq[String]): Option[DataFrame] = {
    val p = latestPath(storeDir)
    if (Files.exists(p))
      Some(spark.read.parquet(
        s"$storeDir/v${new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim}"))
    else None
  }

  /** One batch of the protocol — public so replay interleavings are
    * directly testable. A version dir is IMMUTABLE once `_latest` has
    * passed it: a replay of an already-swapped batch is a pure no-op
    * (never a rewrite of the dir the store currently reads — no
    * read-overwrite-same-path hazard), and a replay after a crash
    * BEFORE the swap re-derives v<batchId> from the old snapshot it
    * was derived from the first time — same bytes, then the swap. */
  def applyBatch(batch: DataFrame, batchId: Long, storeDir: String,
      key: String, opCol: String, verCol: String,
      valueCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val p = latestPath(storeDir)
    val latest: Option[Long] =
      if (Files.exists(p))
        Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
      else None
    if (latest.exists(_ >= batchId)) return // already applied and swapped
    applyBatchFrom(latest, batch, batchId, storeDir, key, opCol, verCol, valueCols)
  }

  /** The body of [[applyBatch]] with the parent-version read made
    * explicit — `parent` is the `_latest` value this writer derived
    * its snapshot from. Package-private so SinkSpec can reproduce the
    * two-writer race deterministically (a stale `parent` next to a
    * newer committed version), which [[claimCommit]] must refuse. */
  private[graft] def applyBatchFrom(parent: Option[Long], batch: DataFrame,
      batchId: Long, storeDir: String, key: String, opCol: String,
      verCol: String, valueCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val base = parent.map(v => spark.read.parquet(s"$storeDir/v$v"))
      .getOrElse(batch.select((key +: valueCols).map(col): _*).limit(0))
    val next = Snapshot.applyChanges(base, batch, key, opCol, verCol, valueCols)
    next.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
    // CAS guard BETWEEN durability and visibility: the snapshot is on
    // disk, but _latest only advances if no other writer committed
    // past our parent in the meantime
    claimCommit(storeDir, batchId, parent.getOrElse(-1L))
    val tmp = Paths.get(storeDir, s"_latest.tmp.$batchId")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPath(storeDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The sink: wire to `.start()`. `changes` is the streaming CDC
    * frame; the checkpoint gives batchId stability across restarts
    * (the replay key of the protocol above). */
  def mergeSink(changes: DataFrame, storeDir: String, checkpoint: String,
      key: String, opCol: String, verCol: String,
      valueCols: Seq[String]): DataStreamWriter[Row] = {
    Files.createDirectories(Paths.get(storeDir))
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, storeDir, key, opCol, verCol, valueCols)
      }
  }

  // ------------------------------------------------------------------
  // Bucketed store: partial-partition rewrites (the 100 TB shape)
  // ------------------------------------------------------------------
  //
  // [[applyBatch]] rewrites the FULL snapshot per batch — O(store) I/O
  // per micro-batch, the documented limitation a continuous-CDC user
  // hits first. The bucketed protocol keeps the store hash-partitioned
  // into `nBuckets` by key and rewrites ONLY the buckets the changeset
  // touches: per batch the cost is O(touched buckets), not O(store) —
  // exactly the partition-level rewrite a table format's MERGE does.
  //
  // Layout:  storeDir/v<version>/_bucket=<b>/…parquet   (immutable)
  //          storeDir/_manifests/<version>              "b v" lines
  //          storeDir/_commits/<version>                CAS markers
  //          storeDir/_latest                           current version
  //
  // The manifest maps every bucket to the VERSION whose v-dir holds
  // its current file; untouched buckets keep their old mapping, so old
  // v-dirs stay live until every bucket has moved past them. Replay
  // safety is the same argument as applyBatch: v-dirs and manifests
  // are immutable once written, a replay re-derives them from the same
  // parent manifest (same bytes), and the CAS guard refuses a swap
  // over a version it never saw.

  private def manifestsDir(storeDir: String) = Paths.get(storeDir, "_manifests")

  private def readManifest(storeDir: String, version: Long): Map[Long, Long] = {
    val p = manifestsDir(storeDir).resolve(version.toString)
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(b, v) = l.split(' '); (b.toLong, v.toLong)
      }.toMap
  }

  private def writeManifest(storeDir: String, version: Long,
      m: Map[Long, Long]): Unit = {
    Files.createDirectories(manifestsDir(storeDir))
    val body = m.toSeq.sorted.map { case (b, v) => s"$b $v" }.mkString("\n")
    val tmp = manifestsDir(storeDir).resolve(s".$version.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestsDir(storeDir).resolve(version.toString),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def bucketOf(key: String, nBuckets: Int) =
    pmod(xxhash64(col(key)), lit(nBuckets.toLong))

  /** The store's current contents under the bucketed protocol. Buckets
    * are grouped by owning version, so the read costs one pruned scan
    * per LIVE version (old versions age out as their buckets move). */
  def currentBucketedSnapshot(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): Option[DataFrame] = {
    val p = latestPath(storeDir)
    if (!Files.exists(p)) return None
    val latest = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    val manifest = readManifest(storeDir, latest)
    val byVersion = manifest.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    Some(byVersion.toSeq.sortBy(_._1).map { case (v, buckets) =>
      spark.read.parquet(s"$storeDir/v$v")
        .filter(col("_bucket").isin(buckets: _*)) // partition-pruned
    }.reduce(_ unionByName _))
  }

  /** One bucketed batch: read ONLY the touched buckets' current files,
    * merge, write them under v<batchId>, publish the remapped manifest,
    * CAS, swap. Touched-bucket discovery is a distinct-aggregate
    * collect bounded by `nBuckets` (a model-sized collect, like the
    * IVF codebooks), never by changeset or store size. */
  def applyBucketedBatch(batch: DataFrame, batchId: Long, storeDir: String,
      key: String, opCol: String, verCol: String, valueCols: Seq[String],
      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    val spark = batch.sparkSession
    val p = latestPath(storeDir)
    val latest: Option[Long] =
      if (Files.exists(p))
        Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
      else None
    if (latest.exists(_ >= batchId)) return // already applied and swapped
    val parent = latest.getOrElse(-1L)
    val manifest = latest.map(readManifest(storeDir, _)).getOrElse(Map.empty)
    val touched = batch.select(bucketOf(key, nBuckets).as("_bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (touched.nonEmpty) {
      val emptyBase = batch.select((key +: valueCols).map(col): _*).limit(0)
      // the touched buckets' CURRENT rows, grouped by owning version
      // so each version dir is scanned once with partition pruning
      val base = touched.flatMap(b => manifest.get(b).map(v => (v, b)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (v, bs) =>
          spark.read.parquet(s"$storeDir/v$v")
            .filter(col("_bucket").isin(bs.map(_._2): _*))
            .select((key +: valueCols).map(col): _*)
        }
        .foldLeft(emptyBase)(_ unionByName _)
      val next = Snapshot.applyChanges(base, batch, key, opCol, verCol, valueCols)
        .withColumn("_bucket", bucketOf(key, nBuckets))
      next.write.mode("overwrite").partitionBy("_bucket")
        .parquet(s"$storeDir/v$batchId")
    }
    // untouched buckets keep their old version; a touched bucket whose
    // merged content is EMPTY (all keys deleted) leaves the manifest
    val merged = manifest -- touched ++
      touched.filter(b => Files.exists(
          Paths.get(storeDir, s"v$batchId", s"_bucket=$b")))
        .map(b => b -> batchId)
    writeManifest(storeDir, batchId, merged)
    claimCommit(storeDir, batchId, parent)
    val tmp = Paths.get(storeDir, s"_latest.tmp.$batchId")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPath(storeDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Vacuum: delete version dirs no LIVE bucket references (a table
    * format's expire-snapshots). Only versions strictly BEFORE the
    * current one are candidates — the current version dir stays even
    * if every bucket has already moved past it, so a reader that
    * resolved `_latest` just before the vacuum can still finish its
    * scan. Manifests and commit markers are kept for every retained
    * version and dropped with the dirs they describe. Returns the
    * versions removed. Safe to run any time from the single writer
    * (concurrent writers are already excluded by the CAS). */
  def vacuumBucketedStore(storeDir: String): Seq[Long] = {
    val p = latestPath(storeDir)
    if (!Files.exists(p)) return Seq.empty
    val latest = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    val live = readManifest(storeDir, latest).values.toSet + latest
    val versions = {
      val s = Files.list(Paths.get(storeDir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).flatMap(_.drop(1).toLongOption).toList
      finally s.close()
    }
    val dead = versions.filter(v => v < latest && !live.contains(v)).sorted
    dead.foreach { v =>
      def rm(path: java.nio.file.Path): Unit = {
        if (Files.isDirectory(path)) {
          val s = Files.list(path)
          try s.iterator().asScala.toList.foreach(rm) finally s.close()
        }
        Files.deleteIfExists(path)
      }
      rm(Paths.get(storeDir, s"v$v"))
      Files.deleteIfExists(manifestsDir(storeDir).resolve(v.toString))
      Files.deleteIfExists(commitsDir(storeDir).resolve(v.toString))
    }
    dead
  }

  /** The bucketed sink: [[mergeSink]]'s wiring over
    * [[applyBucketedBatch]]. */
  def bucketedMergeSink(changes: DataFrame, storeDir: String,
      checkpoint: String, key: String, opCol: String, verCol: String,
      valueCols: Seq[String], nBuckets: Int = 64): DataStreamWriter[Row] = {
    Files.createDirectories(Paths.get(storeDir))
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBucketedBatch(batch, batchId, storeDir, key, opCol, verCol,
          valueCols, nBuckets)
      }
  }
}
