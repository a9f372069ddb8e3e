package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** A test-only Hadoop filesystem with its OWN scheme (`graftlocal://`),
  * delegating to the local disk — the rig that proves the store's path
  * layer genuinely routes through `org.apache.hadoop.fs.FileSystem`
  * (StoreIO's Hadoop backend) and not through some file:-special-case:
  * a `graftlocal://` store path can only work if every metadata
  * primitive (claim CREATE_NEW, pointer swap, manifest list, mtime
  * lease) AND every Spark parquet read/write resolves through the
  * Hadoop API. Mirrors hadoop's own `RawLocalFs` wiring (the public
  * pattern every custom scheme uses, e.g. hadoop-aws's `S3A`):
  * FileSystem impl for the classic API, DelegateToFileSystem for the
  * FileContext API (which the path layer's atomic overwrite-rename
  * prefers). Enable per test via the live Hadoop conf:
  * `fs.graftlocal.impl` + `fs.AbstractFileSystem.graftlocal.impl`. */
class GraftLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftlocal"
  override def getUri: URI = URI.create("graftlocal:///")
}

/** The FileContext-side binding (constructor signature is the one
  * Hadoop instantiates reflectively). */
class GraftLocalAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new GraftLocalFileSystem(), conf,
      "graftlocal", false)
