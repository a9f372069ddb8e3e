package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, ShortType, StringType, StructType}

import graft.sources.{GraftCatalog, GraftDataSource}
import graft.streaming.MergeSink

/** SQL MAINTENANCE VERBS over MERGE stores — the last store-lifecycle
  * steps that previously needed the Scala API (the reference's declared
  * query interface is ad-hoc SQL, `/root/reference/ssidentity.c:17-18`;
  * a store OPERATOR is a SQL user too). Injected as a thin parser
  * delegate ([[GraftSqlParser]], via `graft.GraftExtensions`) that
  * recognizes exactly four statements and hands everything else to
  * Spark's parser verbatim:
  *
  * {{{
  * DESCRIBE HISTORY graft.obs               -- one row per retained commit
  * DESCRIBE DETAIL graft.obs                -- one row per live bucket
  * OPTIMIZE graft.obs                       -- compact live buckets
  * OPTIMIZE graft.obs ZORDER BY (ts)        -- compact + cluster
  * OPTIMIZE graft.obs WHERE mac = 'AB'      -- compact that key's bucket only
  * VACUUM graft.obs RETAIN 48 HOURS         -- reclaim dead versions
  * VACUUM graft.obs RETAIN 10 VERSIONS DRY RUN
  * RESTORE TABLE graft.obs TO VERSION AS OF 2
  * RESTORE TABLE graft.obs TO TIMESTAMP AS OF '2026-08-15 12:00:00'
  * CREATE TABLE graft.branch SHALLOW CLONE graft.obs
  * CONVERT TO GRAFT '/data/plain_parquet' KEY (mac) NBUCKETS 64
  * }}}
  *
  * The target is either a catalog-qualified identifier whose FIRST part
  * names a registered [[GraftCatalog]] (`graft.obs`, `graft.ns.obs`) or
  * a quoted store path (`VACUUM '/data/stores/obs'` — also `hdfs://`/
  * `s3a://` paths through the store's Hadoop path layer). Each verb is
  * a driver-side command over store METADATA plus the store's own
  * maintenance jobs — the same CAS-claimed maintenance commits the
  * Scala API makes, so SQL-issued maintenance serializes with live
  * writers exactly like everything else. Each statement returns its
  * evidence as rows (reclaimed versions, the new commit's version, the
  * history listing) — maintenance you can audit from the query shell. */
object GraftMaintenanceSql {

  /** Resolve a statement target to a store directory: a quoted path
    * verbatim (normalized like every store LOCATION), or a multipart
    * identifier whose head names a registered GraftCatalog. */
  private[graft] def resolveDir(spark: SparkSession,
      target: Either[String, Seq[String]]): String = target match {
    case Left(path) => GraftDataSource.storePath(path)
    case Right(parts) =>
      require(parts.length >= 2,
        s"graft: a maintenance target needs a catalog-qualified name " +
          s"(<catalog>.<table>) or a quoted path (got '${parts.mkString(".")}')")
      val catalog =
        try spark.sessionState.catalogManager.catalog(parts.head)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"graft: '${parts.head}' is not a registered catalog — " +
              "maintenance verbs address stores as <graftCatalog>.<table> " +
              "or by quoted path", e)
        }
      catalog match {
        case g: GraftCatalog =>
          g.storeDirOf(Identifier.of(parts.tail.init.toArray, parts.last))
        case other => throw new IllegalArgumentException(
          s"graft: catalog '${parts.head}' is ${other.getClass.getName}, " +
            "not a GraftCatalog — maintenance verbs only run on MERGE stores")
      }
  }

  /** `DESCRIBE HISTORY` — [[MergeSink.storeHistory]] as a command;
    * rows are bounded by retained history (driver-side metadata). */
  case class GraftDescribeHistoryCommand(target: Either[String, Seq[String]])
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("batch_id", LongType, nullable = true)(),
      AttributeReference("n_live_buckets", LongType, nullable = false)(),
      AttributeReference("has_data_dir", BooleanType, nullable = false)(),
      AttributeReference("is_latest", BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      MergeSink.storeHistory(spark, resolveDir(spark, target))
        .collect().toSeq
  }

  /** `DESCRIBE DETAIL` — [[MergeSink.storeStats]] as a command: one
    * row per live bucket (owner version, file count, bytes), the
    * numbers an operator reads BEFORE paying for OPTIMIZE/VACUUM.
    * Driver-side file metadata, O(live buckets). */
  case class GraftDescribeDetailCommand(target: Either[String, Seq[String]])
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("bucket", LongType, nullable = false)(),
      AttributeReference("owner_version", LongType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = true)())
    override def run(spark: SparkSession): Seq[Row] =
      MergeSink.storeStats(spark, resolveDir(spark, target)).collect().toSeq
  }

  /** `OPTIMIZE [WHERE <key predicate>] [ZORDER BY (…)]` — compaction
    * ([[MergeSink.compactBucketedStore]]; no-op row when already
    * compact), a clustered rewrite ([[MergeSink.optimizeStore]]), or —
    * with a WHERE of literal key predicates — the BUCKET-SCOPED
    * rewrite ([[MergeSink.compactBuckets]]): only the named keys'
    * owning buckets compact (each to one key-sorted file), O(owning
    * buckets) instead of O(store) — the Delta `OPTIMIZE … WHERE`
    * analogue with buckets in place of partitions. The predicate must
    * pin the KEY to literals (`key = v`, `key IN (…)`, AND of those;
    * widened literals TRY-cast to the key's type) — anything else
    * refuses loudly rather than silently scanning the store to decide
    * what to compact. WHERE and ZORDER BY together are refused (the
    * scoped rewrite already key-sorts its buckets; curve-clustering is
    * a whole-store layout decision). ZORDER BY of exactly two integral
    * columns interleaves bits (the true z-curve,
    * [[graft.operators.ZOrder.zValue]]); any other column list
    * clusters lexicographically in the given order. */
  case class GraftOptimizeCommand(target: Either[String, Seq[String]],
      zorderBy: Seq[String], where: Option[String] = None)
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("compacted_version", LongType, nullable = true)())

    /** The owning buckets a WHERE of literal key predicates pins —
      * parsed with the session's own expression parser, walked for
      * `key = lit` / `key IN (lits)` conjuncts only. Throws (never
      * guesses) on any other shape. */
    private def whereBuckets(spark: SparkSession, dir: String,
        cond: String): Set[Long] = {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualTo, EvalMode, In, Literal}
      val schema = MergeSink.snapshotSchemaAt(dir, None)
      val keyName = MergeSink.storedKeyName(dir)
        .getOrElse(schema.fields.head.name)
      val keyType = schema(keyName).dataType
      val nB = MergeSink.storedNBuckets(dir).getOrElse(
        throw new IllegalStateException(
          s"graft: $dir is not a bucketed store — OPTIMIZE WHERE needs " +
            "the bucketed layout"))
      def refuse(what: String): Nothing = throw new IllegalArgumentException(
        s"graft: OPTIMIZE WHERE only accepts literal predicates on the " +
          s"key column '$keyName' ($what) — key = <literal>, key IN " +
          "(<literals>), AND of those; for anything else run a full " +
          "OPTIMIZE")
      def isKey(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e match {
          case a: UnresolvedAttribute =>
            a.nameParts.length == 1 &&
              a.nameParts.head.equalsIgnoreCase(keyName)
          case _ => false
        }
      val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      // a parsed WHERE's values arrive UNRESOLVED — a bare Literal or
      // explicit CASTs stacked over one; fold them by re-building each
      // cast step as a RESOLVED TRY-cast (null anywhere = refuse loudly)
      def litValue(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Option[Literal] = e match {
        case l: Literal => Some(l)
        case Cast(child, dt, _, _) => litValue(child).flatMap(l =>
          Option(Cast(l, dt, tz, EvalMode.TRY).eval(null))
            .map(Literal(_, dt)))
        case _ => None
      }
      def bucketOfLit(l: org.apache.spark.sql.catalyst.expressions.Expression)
          : Long = litValue(l) match {
        case Some(lit) =>
          val v =
            if (lit.dataType == keyType) lit.value
            else Cast(lit, keyType, tz, EvalMode.TRY).eval(null)
          if (v == null) refuse(s"literal ${l.sql} does not cast to the " +
            s"key type ${keyType.simpleString}")
          MergeSink.bucketForInternalLiteral(v, keyType, nB)
        case None => refuse(s"non-literal ${l.sql}")
      }
      def walk(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Set[Long] = e match {
        case And(l, r) => walk(l) ++ walk(r)
        case EqualTo(k, v) if isKey(k) => Set(bucketOfLit(v))
        case EqualTo(v, k) if isKey(k) => Set(bucketOfLit(v))
        case In(k, vs) if isKey(k) => vs.map(bucketOfLit).toSet
        case other => refuse(s"unsupported shape ${other.sql}")
      }
      walk(spark.sessionState.sqlParser.parseExpression(cond))
    }

    override def run(spark: SparkSession): Seq[Row] = {
      val dir = resolveDir(spark, target)
      require(where.isEmpty || zorderBy.isEmpty,
        "graft: OPTIMIZE WHERE and ZORDER BY are mutually exclusive — " +
          "the scoped rewrite already key-sorts its buckets")
      val result =
        if (where.isDefined)
          MergeSink.compactBuckets(spark, dir, whereBuckets(spark, dir, where.get))
        else if (zorderBy.isEmpty) MergeSink.compactBucketedStore(spark, dir)
        else {
          val schema = MergeSink.snapshotSchemaAt(dir, None)
          val missing = zorderBy.filterNot(schema.fieldNames.contains)
          require(missing.isEmpty,
            s"graft: ZORDER BY column(s) ${missing.mkString(", ")} not in " +
              s"$dir's schema (${schema.fieldNames.mkString(", ")})")
          def integral(c: String) = schema(c).dataType match {
            case LongType | IntegerType | ShortType => true
            case _ => false
          }
          val orderCols =
            if (zorderBy.length == 2 && zorderBy.forall(integral))
              Seq(graft.operators.ZOrder.zValue(
                col(zorderBy.head).cast("long"), col(zorderBy(1)).cast("long")))
            else zorderBy.map(col)
          MergeSink.optimizeStore(spark, dir, orderCols)
        }
      Seq(Row(result.map(java.lang.Long.valueOf).orNull))
    }
  }

  /** `VACUUM RETAIN n VERSIONS | RETAIN h HOURS [DRY RUN]` — one row
    * per reclaimed (or reclaimable, under DRY RUN) version. The SQL
    * verb REQUIRES an explicit RETAIN clause (except under DRY RUN,
    * which touches nothing): the lakehouse verb this mirrors defaults
    * to a retention floor with a safety check, so a bare
    * `VACUUM graft.obs` silently destroying all reclaimable
    * time-travel history would be exactly the surprise an operator
    * doesn't expect. `RETAIN 0 VERSIONS` states the
    * liveness-only intent explicitly; the Scala API
    * ([[MergeSink.vacuumBucketedStore]]) keeps its documented zero
    * default for programmatic callers. */
  case class GraftVacuumCommand(target: Either[String, Seq[String]],
      retainVersions: Int, retainHours: Double, dryRun: Boolean,
      retainSpecified: Boolean) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference(if (dryRun) "reclaimable_version" else "reclaimed_version",
        LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      require(retainSpecified || dryRun,
        "graft: VACUUM with no RETAIN clause would immediately reclaim " +
          "ALL dead time-travel history — state the retention explicitly " +
          "(VACUUM … RETAIN 48 HOURS / RETAIN 10 VERSIONS; RETAIN 0 " +
          "VERSIONS for liveness-only reclamation), or preview with " +
          "DRY RUN")
      val dir = resolveDir(spark, target)
      // PLAIN-protocol stores (IVM view stores, the unbucketed sink)
      // have no manifests — their vacuum is version-count-only, and
      // the head always survives (retain floor 1)
      val plain = !graft.store.StoreFiles.exists(
        graft.store.StorePaths.get(dir, "_manifests"))
      if (plain) {
        require(retainHours == 0.0,
          "graft: RETAIN … HOURS is not supported on a plain-protocol " +
            "store (no commit-time manifests to date versions by) — " +
            "use RETAIN n VERSIONS")
        // REFUSE rather than silently clamp: a plain store's head IS
        // its only full snapshot (no manifests re-referencing older
        // version dirs), so the head version dir must survive every
        // vacuum — "RETAIN 0 VERSIONS" (liveness-only) cannot be
        // honored as stated here, and clamping it to 1 without a
        // signal would hand the operator a different retention than
        // they asked for.
        require(!(retainSpecified && retainVersions == 0),
          "graft: RETAIN 0 VERSIONS is not honorable on a " +
            "plain-protocol store — the head version dir is the only " +
            "full snapshot and must survive (retention floor is 1); " +
            "state RETAIN 1 VERSIONS explicitly")
        MergeSink.vacuumPlainStore(dir,
          retainLast = math.max(1, retainVersions), dryRun = dryRun).map(Row(_))
      } else MergeSink.vacuumBucketedStore(dir,
        retainLast = retainVersions,
        retainMillis = (retainHours * 3600L * 1000L).toLong,
        dryRun = dryRun).map(Row(_))
    }
  }

  /** `CREATE TABLE <dst> SHALLOW CLONE <src>` —
    * [[MergeSink.cloneStore]]: a zero-copy branch referencing the
    * source's immutable version dirs (registered against the source's
    * vacuum until released); branch and source then evolve
    * independently. Returns the clone-point version. */
  case class GraftCloneCommand(dst: Either[String, Seq[String]],
      src: Either[String, Seq[String]]) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("clone_point_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(MergeSink.cloneStore(spark,
        resolveDir(spark, src), resolveDir(spark, dst))))
  }

  /** `CONVERT TO GRAFT <target> KEY (<col>) [NBUCKETS n]` —
    * [[MergeSink.convertToStore]]: adopt a flat parquet directory in
    * place as a v0 store commit through the normal claim protocol
    * (key-unique, key-first, bucketed rewrite, originals swept);
    * refuses a directory that is already a store. Returns the head
    * version. */
  case class GraftConvertCommand(target: Either[String, Seq[String]],
      key: String, nBuckets: Option[Int]) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("converted_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(MergeSink.convertToStore(spark, resolveDir(spark, target),
        key, nBuckets.getOrElse(64))))
  }

  /** `ALTER TABLE … ADD CONSTRAINT <name> CHECK (<expr>)` —
    * [[MergeSink.addConstraint]]: a CAS-claimed metadata commit that
    * first proves the EXISTING data satisfies the gate under the
    * claim; from then on every batch/DML commit validates its upsert
    * rows and refuses atomically (first offending row named). SQL
    * NULL semantics: only FALSE violates — state NOT NULL as
    * `CHECK (c IS NOT NULL)`. Returns the activation version. */
  case class GraftAddConstraintCommand(target: Either[String, Seq[String]],
      name: String, expr: String) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("constrained_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(MergeSink.addConstraint(spark,
        resolveDir(spark, target), name, expr)))
  }

  /** `ALTER TABLE … DROP CONSTRAINT <name>` —
    * [[MergeSink.dropConstraint]] (a metadata commit; the
    * deactivation is part of history). */
  case class GraftDropConstraintCommand(target: Either[String, Seq[String]],
      name: String) extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("unconstrained_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(MergeSink.dropConstraint(resolveDir(spark, target), name)))
  }

  /** `RESTORE TABLE … TO VERSION|TIMESTAMP AS OF …` —
    * [[MergeSink.restoreStore]]: a zero-copy maintenance commit whose
    * manifest re-references the restore point; returns the new head
    * version (the rollback is itself history — diff it with the
    * change feed). */
  case class GraftRestoreCommand(target: Either[String, Seq[String]],
      version: Option[Long], timestamp: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[AttributeReference] = Seq(
      AttributeReference("restored_to_version", LongType, nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val dir = resolveDir(spark, target)
      val v = version.getOrElse(MergeSink.versionAtTimestamp(dir,
        GraftDataSource.parseTimestampMillis(timestamp.get)))
      Seq(Row(v, MergeSink.restoreStore(spark, dir, v)))
    }
  }
}

/** The delegating parser: the maintenance statements above, everything
  * else verbatim to the session's parser, including parameterized
  * plans. Identifier targets are re-parsed with the DELEGATE's
  * `parseMultipartIdentifier`, so backticks and quoting behave exactly
  * like every other Spark identifier.
  *
  * INTERCEPTION IS CLAIM-CHECKED, never grabby: a statement is only
  * taken when its target is provably ours — a quoted path, or a
  * multipart identifier whose FIRST part names a catalog registered as
  * a [[GraftCatalog]] in THIS session (checked at parse time). Any
  * other shape — `DESCRIBE history some_col` (a table literally named
  * history), another lakehouse's `OPTIMIZE`/`VACUUM`/`RESTORE` on its
  * own catalog, a CTAS whose query merely CONTAINS the words "SHALLOW
  * CLONE", an unparsable target — falls through to the delegate
  * verbatim, so installing the extension never changes the meaning or
  * the error of a statement that wasn't addressed to a graft store. */
class GraftSqlParser(session: => org.apache.spark.sql.SparkSession,
    delegate: ParserInterface) extends ParserInterface {
  import GraftMaintenanceSql._

  private val DescHistory =
    """(?is)^\s*(?:DESCRIBE|DESC)\s+HISTORY\s+(.+?)\s*;?\s*$""".r
  private val DescDetail =
    """(?is)^\s*(?:DESCRIBE|DESC)\s+DETAIL\s+(.+?)\s*;?\s*$""".r
  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+(.+?)((?:\s+RETAIN\s+\S+\s+(?:VERSIONS|HOURS))*)(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val Retain = """(?i)RETAIN\s+(\S+)\s+(VERSIONS|HOURS)""".r
  private val RestoreV =
    """(?is)^\s*RESTORE\s+TABLE\s+(.+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val RestoreT =
    """(?is)^\s*RESTORE\s+TABLE\s+(.+?)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  private val Clone =
    """(?is)^\s*CREATE\s+TABLE\s+(.+?)\s+SHALLOW\s+CLONE\s+(.+?)\s*;?\s*$""".r
  private val Convert =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+(.+?)\s+KEY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)(?:\s+NBUCKETS\s+(\d+))?\s*;?\s*$""".r
  private val AddConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((.+)\)\s*;?\s*$""".r
  private val DropConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r

  /** A PROVABLY-OURS statement target, or None (→ delegate): a
    * `'quoted/path'`, or a ≥2-part identifier whose head names a
    * registered [[GraftCatalog]] in this session. Unparsable targets
    * and foreign catalogs are None — never an error at parse time. */
  private def target(raw: String): Option[Either[String, Seq[String]]] = {
    val t = raw.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      Some(Left(t.substring(1, t.length - 1)))
    else
      try {
        val parts = delegate.parseMultipartIdentifier(t)
        if (parts.length >= 2 &&
          session.sessionState.catalogManager.catalog(parts.head)
            .isInstanceOf[GraftCatalog]) Some(Right(parts))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case DescHistory(t) => target(t).map(GraftDescribeHistoryCommand)
      case DescDetail(t) => target(t).map(GraftDescribeDetailCommand)
      case RestoreV(t, v) => target(t).map(GraftRestoreCommand(_,
        Some(v.toLong), None))
      case RestoreT(t, ts) => target(t).map(GraftRestoreCommand(_,
        None, Some(ts)))
      case Clone(dst, src) => for { d <- target(dst); s <- target(src) }
        yield GraftCloneCommand(d, s)
      case Convert(t, key, nb) => target(t).map(GraftConvertCommand(_,
        key, Option(nb).map(_.toInt)))
      case AddConstraint(t, name, expr) =>
        target(t).map(GraftAddConstraintCommand(_, name, expr.trim))
      case DropConstraint(t, name) =>
        target(t).map(GraftDropConstraintCommand(_, name))
      case Optimize(t, w, z) => target(t).map(GraftOptimizeCommand(_,
        Option(z).map(_.split(',').map(c =>
          delegate.parseMultipartIdentifier(c.trim).last).toSeq)
          .getOrElse(Nil), Option(w).map(_.trim)))
      case Vacuum(t, retains, dry) => target(t).map { tgt =>
        var versions = 0
        var hours = 0.0
        var specified = false
        Retain.findAllMatchIn(Option(retains).getOrElse("")).foreach { m =>
          specified = true
          val n = m.group(1)
          m.group(2).toUpperCase match {
            case "VERSIONS" => versions = n.toIntOption.getOrElse(
              throw new IllegalArgumentException(
                s"graft: RETAIN $n VERSIONS needs an integer (got '$n')"))
            case _ => hours = n.toDoubleOption.getOrElse(
              throw new IllegalArgumentException(
                s"graft: RETAIN $n HOURS needs a number (got '$n')"))
          }
        }
        GraftVacuumCommand(tgt, versions, hours, dry != null, specified)
      }
      case _ => None
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenancePlan(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
