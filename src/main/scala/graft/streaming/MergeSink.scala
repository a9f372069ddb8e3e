package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
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
}
