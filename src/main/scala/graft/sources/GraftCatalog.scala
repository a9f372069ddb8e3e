package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
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
  * is a committed store (`_latest` present). Tables are CREATED by
  * writing (the MERGE sink, `writeStream.format("graft")`, or a first
  * `df.write.format("graft")` batch) — `CREATE TABLE` only ADOPTS an
  * existing store (external-table registration semantics); schema
  * changes go through the store's own evolution
  * ([[MergeSink.addColumns]]), never `ALTER TABLE` (the registry, not
  * the catalog, is the source of truth); DROP/RENAME are refused — a
  * store's lifecycle (vacuum, erasure, clone) is deliberately not a
  * one-line SQL away. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"graft: catalog '$name' needs spark.sql.catalog.$name.warehouse")
    warehouse = GraftDataSource.localPath(w)
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

  private def isStore(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_latest"))

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
    new GraftTable(dir, MergeSink.snapshotSchemaAt(dir, version), version)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : Table = {
    val dir = dirOf(ident)
    if (isStore(dir)) {
      // adoption of an existing store (external-table registration):
      // the store's own registry is the schema authority
      new GraftTable(dir, MergeSink.snapshotSchemaAt(dir, None), None)
    } else if (tableExists(ident)) {
      throw new TableAlreadyExistsException(ident)
    } else throw new UnsupportedOperationException(
      s"graft: catalog '$catalogName' cannot create an EMPTY store at " +
        s"$dir — stores are created by their first committed write " +
        "(the MERGE sink, writeStream.format(\"graft\"), or " +
        "df.write.format(\"graft\").mode(\"append\")); CREATE TABLE " +
        "adopts a store that already exists")
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft: ALTER TABLE is not the store's evolution path — use " +
        "MergeSink.addColumns (a metadata-only, CAS-committed, " +
        "time-travel-aware evolution the registry records); the catalog " +
        "serves whatever the registry says")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft: DROP TABLE is refused — a store's lifecycle runs through " +
        "vacuumBucketedStore / eraseKeys / releaseClone, never a " +
        "one-line SQL drop")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft: RENAME TABLE is refused — store paths are referenced by " +
        "clone origins and subscriber offsets; copy via cloneStore instead")
}
