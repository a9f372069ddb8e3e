package graft.sources

import scala.jdk.CollectionConverters._

// the store's path layer: local java.nio semantics for plain paths,
// org.apache.hadoop.fs for scheme'd warehouses (hdfs://, s3a://, …)
import graft.store.{StoreFiles => Files, StorePaths => Paths}

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.MergeSink

/** A Spark CATALOG over a directory of MERGE stores — the piece that
  * makes the SQL-native time-travel SYNTAX work (a `TableProvider`
  * alone only gets read OPTIONS):
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/stores
  *
  * SELECT * FROM graft.obs
  * SELECT * FROM graft.obs VERSION AS OF 2
  * SELECT * FROM graft.obs TIMESTAMP AS OF '2026-08-15 12:00:00'
  * INSERT INTO graft.obs VALUES (...)
  * }}}
  *
  * Identifiers map to store directories under the warehouse
  * (`graft.ns.obs` → `<warehouse>/ns/obs`); a table EXISTS iff the dir
  * is a committed store (`_latest` present). `CREATE TABLE` with a
  * column list (or CTAS) CREATES a store — an empty v0 committed
  * through the normal claim protocol, `key`/`nBuckets` as table
  * properties — and without one ADOPTS an existing store
  * (external-table registration semantics); stores are equally created
  * by a first write (the MERGE sink, `writeStream.format("graft")`).
  * Schema changes go through the store's own evolution
  * ([[MergeSink.addColumns]]), never `ALTER TABLE` (the registry, not
  * the catalog, is the source of truth); RENAME is refused and DROP
  * only reverts a created-but-never-written store (CTAS failure
  * cleanup) — a data-bearing store's lifecycle (vacuum, erasure,
  * clone) is deliberately not a one-line SQL away. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"graft: catalog '$name' needs spark.sql.catalog.$name.warehouse")
    warehouse = GraftDataSource.storePath(w)
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String = {
    val parts = ident.namespace().toSeq :+ ident.name()
    // identifiers are DIRECTORY names under the warehouse, never path
    // expressions: refuse separators and traversal outright (a
    // backticked identifier can carry arbitrary characters)
    val bad = parts.filter(p => p.isEmpty || p == "." || p == ".." ||
      p.exists(c => c == '/' || c == '\\' || c == 0))
    require(bad.isEmpty,
      s"graft: invalid table identifier segment(s) ${bad.mkString(", ")} — " +
        "identifiers name directories under the warehouse")
    (warehouse +: parts).mkString("/")
  }

  /** The store directory an identifier names — the SQL maintenance
    * verbs' resolution hook (org.apache.spark.sql.graft
    * .GraftMaintenanceSql lives outside this package tree). */
  def storeDirOf(ident: Identifier): String = dirOf(ident)

  // through the store's own head read, not a bare `_latest` probe:
  // on a delete-then-rename backend the pointer vanishes for the
  // swap window, and a table must not flicker out of existence
  // mid-swap (MergeSink.latestVersion carries the reader retry). A
  // store whose pointer is GONE past the retry but whose commit
  // evidence survives still EXISTS — reading it then fails loudly
  // with the repair named, which is the right place for that error
  // (a SHOW TABLES must not hide a damaged store, nor blow up on it).
  private def isStore(dir: String): Boolean =
    try MergeSink.latestVersion(dir).isDefined
    catch { case _: IllegalStateException => true }

  override def tableExists(ident: Identifier): Boolean = isStore(dirOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = (warehouse +: namespace.toSeq).mkString("/")
    val p = Paths.get(base)
    if (!Files.isDirectory(p)) return Array.empty
    val s0 = Files.list(p)
    try s0.iterator().asScala
      .filter(d => Files.isDirectory(d) && isStore(d.toString))
      .map(d => Identifier.of(namespace, d.getFileName.toString))
      .toArray
    finally s0.close()
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF <v>` — the catalog hook Spark's SQL time-travel
    * syntax resolves through. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft: VERSION AS OF expects a store version (got '$version')"))))

  /** `TIMESTAMP AS OF <t>` — Spark hands the resolved timestamp in
    * MICROseconds; commit times are manifest mtimes (millis). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadAt(ident, Some(
      MergeSink.versionAtTimestamp(dirOf(ident), timestamp / 1000L)))

  private def loadAt(ident: Identifier, version: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isStore(dir)) throw new NoSuchTableException(ident)
    // autoEvolve: a catalog-loaded table may advertise AUTOMATIC_SCHEMA_
    // EVOLUTION — the analyzer's MERGE evolution routes back through
    // THIS catalog's alterTable, i.e. the store's own addColumns commit
    new GraftTable(dir, MergeSink.snapshotSchemaAt(dir, version), version,
      autoEvolve = true)
  }

  /** CREATE TABLE: adopts an existing store (external-table
    * registration — the registry is the schema authority), or, given
    * an explicit schema, CREATES one by committing an empty v0 through
    * the store's normal claim protocol — so the whole lifecycle is
    * SQL-operable:
    *
    * {{{
    * CREATE TABLE graft.obs (k BIGINT, name STRING, v BIGINT)
    *   TBLPROPERTIES (key = 'k', nBuckets = '8')
    * CREATE TABLE graft.obs2 AS SELECT ...   -- CTAS: create + INSERT
    * }}}
    *
    * `key` defaults to the first column (which it must be — the
    * snapshot convention every reader shares); `nBuckets` defaults
    * to 64. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : Table = {
    val dir = dirOf(ident)
    if (isStore(dir)) {
      // adoption of an existing store (external-table registration):
      // the store's own registry is the schema authority. A DECLARED
      // schema/key/bucket count must MATCH the registry — silently
      // adopting under a conflicting declaration would mask a mistyped
      // table name or a genuine schema conflict (the user asked for a
      // table shaped one way and got another without a word).
      val live = MergeSink.snapshotSchemaAt(dir, None)
      if (schema.fields.nonEmpty) {
        val declared = schema.fields.map(f => (f.name, f.dataType)).toSeq
        val actual = live.fields.map(f => (f.name, f.dataType)).toSeq
        require(declared == actual,
          s"graft: CREATE TABLE declares (${declared.map(c =>
            s"${c._1} ${c._2.simpleString}").mkString(", ")}) but the " +
            s"existing store at $dir records (${actual.map(c =>
            s"${c._1} ${c._2.simpleString}").mkString(", ")}) — adopt " +
            "with no column list, or declare the store's actual shape")
      }
      // the key/nBuckets properties are checked on EVERY adoption —
      // with or without a column list: a bare CREATE TABLE declaring
      // a conflicting key must refuse just as loudly
      val props = new CaseInsensitiveStringMap(properties)
      Option(props.get("key")).foreach { k =>
        val stored = MergeSink.storedKeyName(dir)
          .getOrElse(live.fields.head.name)
        require(k == stored,
          s"graft: CREATE TABLE declares key '$k' but the store at " +
            s"$dir is keyed by '$stored'")
      }
      Option(props.get("nbuckets")).map(_.toLong).foreach { n =>
        MergeSink.storedNBuckets(dir).foreach(stored =>
          require(n == stored,
            s"graft: CREATE TABLE declares nBuckets=$n but the store " +
              s"at $dir is bucketed into $stored"))
      }
      new GraftTable(dir, live, None, autoEvolve = true)
    } else if (schema.fields.nonEmpty) {
      require(partitions.isEmpty,
        "graft: PARTITIONED BY is not supported — the store buckets by key")
      val props = new CaseInsensitiveStringMap(properties)
      val key = Option(props.get("key")).getOrElse(schema.fields.head.name)
      val nBuckets = Option(props.get("nbuckets")).map(_.toInt).getOrElse(64)
      MergeSink.createEmptyStore(dir, schema, key, nBuckets)
      new GraftTable(dir, MergeSink.snapshotSchemaAt(dir, None), None,
        autoEvolve = true)
    } else throw new UnsupportedOperationException(
      s"graft: catalog '$catalogName' cannot create a store at $dir " +
        "without a schema — declare columns (CREATE TABLE t (k BIGINT, " +
        "…) with optional TBLPROPERTIES key/nBuckets), run CTAS, or " +
        "adopt a store an earlier write created")
  }

  /** `ALTER TABLE … ADD COLUMNS / RENAME COLUMN / DROP COLUMN` route
    * to the store's OWN metadata-only evolution commits
    * ([[MergeSink.addColumns]] / renameColumn / dropColumn): one
    * CAS-claimed commit each, no data moves, time travel keeps the
    * then-current schema, old writers keep committing (added columns
    * are optional; a dropped column's physical name is retired). The
    * registry stays the source of truth — the catalog never stores a
    * schema of its own. Position clauses are refused (store schemas
    * are strictly append-only: every reader aligns columns by NAME,
    * but the key column must stay first); retyping stays refused —
    * a type change rewrites the store explicitly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isStore(dir)) throw new NoSuchTableException(ident)
    // RENAME COLUMN: the column-mapping metadata commit (logical name
    // moves, the physical file name is pinned — MergeSink.renameColumn)
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty && renames.length == changes.length) {
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          s"graft: nested column '${r.fieldNames.mkString(".")}' — stores " +
            "rename TOP-LEVEL columns")
        MergeSink.renameColumn(dir, r.fieldNames.head, r.newName)
      }
      return loadAt(ident, None)
    }
    // DROP COLUMN: the column-mapping metadata commit (the field leaves
    // the schema; the orphaned physical file column is never projected
    // again and its name is retired — MergeSink.dropColumn)
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    if (drops.nonEmpty && drops.length == changes.length) {
      drops.foreach { d =>
        require(d.fieldNames.length == 1,
          s"graft: nested column '${d.fieldNames.mkString(".")}' — stores " +
            "drop TOP-LEVEL columns")
        MergeSink.dropColumn(dir, d.fieldNames.head)
      }
      return loadAt(ident, None)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.isEmpty || adds.length != changes.length)
      throw new UnsupportedOperationException(
        "graft: only ALTER TABLE ... ADD COLUMNS, RENAME COLUMN and " +
          "DROP COLUMN evolve a store (metadata-only, CAS-committed, " +
          "time-travel-aware commits the registry records) — retyping " +
          "rewrites the store explicitly")
    val fields = adds.map { a =>
      require(a.fieldNames.length == 1,
        s"graft: nested column '${a.fieldNames.mkString(".")}' — stores " +
          "evolve by adding TOP-LEVEL columns")
      require(a.position == null,
        s"graft: FIRST/AFTER positions are not supported — store schemas " +
          "append new columns (readers align by name)")
      val meta = Option(a.comment)
        .map(c => new org.apache.spark.sql.types.MetadataBuilder()
          .putString("comment", c).build())
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      org.apache.spark.sql.types.StructField(
        a.fieldNames.head, a.dataType, nullable = true, metadata = meta)
    }
    MergeSink.addColumns(dir, fields.toSeq)
    loadAt(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    // the ONE droppable state: a created-but-never-written store (the
    // empty v0 bootstrap) — this is CTAS's failure cleanup (Spark
    // drops the created table when the backing write fails); anything
    // ever written stays refused
    // serialized against a racing first write through the store's own
    // claim protocol (a bare check-then-delete could destroy a commit
    // that landed in between — MergeSink.dropEmptyCreatedStore)
    if (isStore(dir) && MergeSink.dropEmptyCreatedStore(dir)) {
      true
    } else throw new UnsupportedOperationException(
      "graft: DROP TABLE is refused once a store holds data — its " +
        "lifecycle runs through vacuumBucketedStore / eraseKeys / " +
        "releaseClone, never a one-line SQL drop (only a created-but-" +
        "never-written store may be dropped)")
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft: RENAME TABLE is refused — store paths are referenced by " +
        "clone origins and subscriber offsets; copy via cloneStore instead")
}
