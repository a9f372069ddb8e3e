package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A test-only Hadoop filesystem emulating OBJECT-STORE (S3-shape)
  * semantics — the ADVERSARIAL sibling of [[GraftLocalFileSystem]]
  * (which still has POSIX rename atomicity underneath). Scheme
  * `graftobj://`; local disk underneath, but the semantics the store's
  * CAS-analogue table (graft.store.StorePath) documents for S3A:
  *
  *   - NO overwrite-rename: `rename(src, dst)` with an EXISTING
  *     destination file returns false (S3A refuses; HDFS fails) —
  *     and the scheme deliberately registers NO `AbstractFileSystem`
  *     binding, so the path layer's `FileContext.rename(OVERWRITE)`
  *     branch is unavailable and every pointer swap takes the
  *     DELETE-THEN-RENAME fallback with its documented
  *     missing-pointer window.
  *   - `create(overwrite = false)` is the ONLY CAS (the S3
  *     conditional-PUT analogue) — inherited exception mapping is the
  *     one StoreHadoopSpec already pins.
  *   - `setTimes` is a SILENT NO-OP (S3A keeps the base-class
  *     default): the claim heartbeat must detect the no-op by
  *     read-back and refresh by re-PUT instead.
  *   - FAULT INJECTION: [[GraftObjFileSystem.renameDelayMs]] holds
  *     every rename TO a `_latest` pointer for that long — stretching
  *     the delete-to-rename window from microseconds to something a
  *     concurrent reader reliably lands in, so the reader retry is
  *     exercised by name rather than by luck.
  */
class GraftObjFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: URI = URI.create("graftobj:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (GraftObjFileSystem.renameDelayMs > 0 && dst.getName == "_latest")
      Thread.sleep(GraftObjFileSystem.renameDelayMs)
    val dstFile =
      try Some(getFileStatus(dst))
      catch { case _: java.io.FileNotFoundException => None }
    if (dstFile.exists(_.isFile)) false // no overwrite-rename on an object store
    else super.rename(src, dst)
  }

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = {
    getFileStatus(p) // existence check still throws like the real call
    () // silent no-op — the S3A shape the heartbeat must survive
  }

  /** ATOMIC create-if-absent for `overwrite = false` — the S3
    * conditional-PUT (If-None-Match) semantics the CAS-analogue table
    * REQUIRES of a production deployment
    * (`fs.s3a.create.conditional.enabled`). Two S3 realities modeled
    * faithfully: (a) RawLocalFileSystem's default is check-then-create
    * — a TOCTOU two racing claimants can both pass, the second
    * silently truncating the first's claim; the conditional PUT
    * refuses exactly one. (b) an S3 object NEVER appears empty — the
    * PUT (and its If-None-Match evaluation) happens when the stream
    * CLOSES, so the content buffers here and the atomic
    * publish-or-refuse fires at close, complete-or-nothing.
    * (`overwrite = true` keeps the parent behavior.) */
  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (overwrite)
      return super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    val local = pathToFile(f).toPath
    Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val buffered = new java.io.ByteArrayOutputStream() {
      override def close(): Unit = {
        super.close()
        try java.nio.file.Files.write(local, toByteArray(),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch {
          case e: java.nio.file.FileAlreadyExistsException => throw e
        }
      }
    }
    new org.apache.hadoop.fs.FSDataOutputStream(buffered, null)
  }
}

object GraftObjFileSystem {
  /** Milliseconds every `_latest` rename is held — widens the
    * delete-then-rename missing-pointer window for the reader-retry
    * tests. 0 = no injection. */
  @volatile var renameDelayMs: Long = 0L
}
