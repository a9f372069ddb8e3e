package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{lit, when}

import graft.sources.GraftTable
import graft.streaming.MergeSink

/** UPDATE / MERGE INTO for graft stores — the remaining SQL DML verbs,
  * delivered the way Delta Lake's extensions historically did: a
  * RESOLUTION RULE rewrites the analyzed [[UpdateTable]] /
  * [[MergeIntoTable]] plans over a graft relation into driver-side
  * commands that build one CDC batch and commit it through the store's
  * OCC protocol. (The DSv2 delta-write alternative would demand
  * per-executor row writers — re-implementing a parquet writer by hand
  * and shipping row payloads through commit messages; the store's
  * whole-batch commit is already the right shape, so the rewrite keeps
  * all machinery on the proven path.)
  *
  * Register with the rest of the front door:
  * `spark.sql.extensions = graft.GraftExtensions`. Semantics:
  *
  *   - UPDATE obs SET v = v + 1 WHERE k < 10 — the matching rows
  *     re-upsert with assignments applied; updating the KEY column is
  *     refused (a keyed store's identity is immutable; delete+insert
  *     expresses re-keying intentionally).
  *   - MERGE INTO obs USING src ON cond WHEN MATCHED [AND c] THEN
  *     UPDATE SET … / DELETE, WHEN NOT MATCHED THEN INSERT …,
  *     WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE — full three-arm
  *     semantics, first-matching-action-wins within each arm, the
  *     standard multiple-source-rows-per-target-row error, all arms
  *     folded into ONE CDC batch = ONE commit (atomic MERGE).
  *
  * Both verbs commit like every other writer (OCC, writer "sql"), so
  * they coexist with live streams; time travel sees the pre-DML state;
  * the change feed carries the DML's net effect. */
object GraftDml {

  private def graftRelation(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftTable)] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable =>
        require(!t.isTimeTravel,
          s"graft: cannot run DML against a time-travel read of ${t.storeDir}")
        Some((r, t))
      case _ => None
    }
    case SubqueryAlias(_, child) => graftRelation(child)
    case _ => None
  }

  /** Flat attribute name of an assignment target; nested fields are
    * refused (store columns are flat by construction). */
  private def assignName(key: Expression): String = key match {
    case a: Attribute => a.name
    case other => throw new UnsupportedOperationException(
      s"graft: only top-level columns can be assigned (got $other)")
  }

  case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperators {
        case u @ UpdateTable(rel, assignments, condition) if u.resolved =>
          graftRelation(rel)
            .map { case (r, t) =>
              // the condition is baked into a FILTER plan (held as a
              // field, not a child): subquery expressions are only
              // legal inside whitelisted node types, and the filtered
              // plan was fully analyzed before this rewrite fired
              GraftUpdateCommand(t.storeDir, r.output,
                condition.map(Filter(_, r)).getOrElse(r), assignments)
            }
            .getOrElse(u)
        case d @ DeleteFromTable(rel, condition) if d.resolved =>
          // ANY predicate deletes — subqueries and UDFs included: the
          // DSv2 SupportsDelete door only admits translatable filters
          // (canDeleteWhere), so conditions beyond it rewrite here the
          // same way UPDATE does, committing one delete-CDC batch
          graftRelation(rel)
            .map { case (r, t) =>
              GraftDeleteCommand(t.storeDir, r.output, Filter(condition, r))
            }
            .getOrElse(d)
        case m: MergeIntoTable if m.resolved =>
          graftRelation(m.targetTable)
            .map { case (r, t) =>
              // WITH SCHEMA EVOLUTION is handled by the ANALYZER
              // (ResolveMergeIntoSchemaEvolution): the store's
              // AUTOMATIC_SCHEMA_EVOLUTION capability routes
              // source-only columns through the catalog's alterTable
              // (= the store's metadata-only addColumns commit) and
              // re-resolves against the widened relation — by the time
              // this rewrite sees a RESOLVED plan, the evolution has
              // already committed. The shapes that CANNOT evolve — a
              // path-addressed relation (no catalog to alter) and a
              // session-catalog table (whose alterTable would widen
              // catalog metadata, not the store registry) — advertise
              // no AUTOMATIC_SCHEMA_EVOLUTION capability: refuse them
              // loudly rather than silently dropping the source-only
              // columns the user asked to keep.
              if (m.withSchemaEvolution && !r.autoSchemaEvolution)
                throw new UnsupportedOperationException(
                  "graft: MERGE WITH SCHEMA EVOLUTION needs a " +
                    "GraftCatalog-addressed target (MERGE INTO " +
                    "<graftCatalog>.<table> …) — the analyzer evolves the " +
                    "store through that catalog's alterTable; on a path- " +
                    "or session-catalog table evolve explicitly (ALTER " +
                    "TABLE … ADD COLUMNS / MergeSink.addColumns), then " +
                    "MERGE")
              GraftMergeCommand(r, t.storeDir, m.sourceTable,
                m.mergeCondition, m.matchedActions, m.notMatchedActions,
                m.notMatchedBySourceActions)
            }
            .getOrElse(m)
      }
  }

  /** Shared CDC commit: the batch carries (key, _op, _ver=0, values…);
    * duplicate keys are refused (one CDC row per key per commit — the
    * MERGE multiple-source-rows rule and the atomicity guarantee).
    *
    * STATEMENT-LEVEL OCC: `derive` rebuilds the CDC batch from a FRESH
    * head read each attempt. The head version is captured BEFORE the
    * batch materializes and handed to the commit as its declared read
    * point — if any touched bucket changes owners between that read
    * and the claim (a concurrent writer landing mid-statement, or an
    * OccRebase re-validating against a moved head), the commit refuses
    * with [[MergeSink.StaleReadException]] and the WHOLE statement
    * re-derives. Values computed from a superseded snapshot are never
    * committed (no lost update / stale DELETE) — the statement
    * serializes on bucket overlap, as documented. */
  private def commitCdc(spark: SparkSession, dir: String,
      derive: () => org.apache.spark.sql.DataFrame, keyName: String,
      valueNames: Seq[String], verb: String,
      deleteOnly: Boolean = false): Unit = {
    val nB = MergeSink.storedNBuckets(dir).getOrElse(
      throw new IllegalStateException(
        s"MergeSink: $dir is not a bucketed store — only bucketed stores " +
          "accept SQL DML")).toInt
    var attempt = 0
    while (true) {
      attempt += 1
      val readV = MergeSink.latestVersion(dir).getOrElse(-1L)
      val cached = graft.operators.Checkpoint(derive())
      // ONE driver action probes both gates: any duplicated key (the
      // MERGE multiple-source-rows rule) and emptiness (statement
      // no-op) — folded into a single aggregate over the checkpointed
      // changeset instead of two separate jobs
      val F = org.apache.spark.sql.functions
      // max(_n) is the duplicate GATE (a duplicated NULL key must trip
      // it too — groupBy folds NULLs into one group, and an ignoreNulls
      // first() over the key alone would discard exactly that group);
      // the flagged key is best-effort for the message.
      val keyNames = MergeSink.keyCols(keyName)
      val probe = cached.groupBy(keyNames.map(new Column(_)): _*)
        .agg(F.count(F.lit(1)).as("_n"))
        .agg(F.count(F.lit(1)), F.max(new Column("_n")),
          F.first(F.when(new Column("_n") > 1,
            F.concat_ws(",", keyNames.map(new Column(_)): _*)),
            ignoreNulls = true))
        .head()
      if (probe.getLong(0) == 0L) return // no-op: nothing matched
      if (probe.getLong(1) > 1L) {
        val dupKey = if (probe.isNullAt(2)) "NULL" else s"'${probe.get(2)}'"
        throw new IllegalArgumentException(
          s"graft: $verb on $dir produces key $dupKey more than " +
            "once — a keyed store commits one row per key (for MERGE this is " +
            "the standard multiple-source-rows error)")
      }
      try {
        MergeSink.applyBucketedBatchOcc(cached, batchId = statementId(), dir,
          keyName, "_op", "_ver", valueNames, nBuckets = nB, writer = "sql",
          replayGuard = false, readVersion = Some(readV),
          deleteOnly = deleteOnly)
        return
      } catch {
        case e: MergeSink.StaleReadException => if (attempt >= 8) throw e
      }
    }
  }

  /** The store's key column for a DML rewrite: the REGISTRY's recorded
    * name (the writers' routing column), first-field convention only
    * for pre-registry stores; a recorded key absent from the relation
    * is refused loudly rather than guessed around. */
  private def keyNameOf(dir: String, cols: Seq[String]): String = {
    val k = MergeSink.storedKeyName(dir).getOrElse(cols.head)
    val missing = MergeSink.keyCols(k).filterNot(cols.contains)
    require(missing.isEmpty,
      s"graft: store $dir records key column(s) '$k' but the relation " +
        s"is missing ${missing.mkString(", ")} (has ${cols.mkString(", ")}) " +
        "— the registry and the schema disagree; refusing DML")
    k
  }

  /** One fresh 63-bit identity per ad-hoc statement — see
    * [[MergeSink.applyBucketedBatchOcc]]'s replayGuard notes: with no
    * replay lineage, a SHARED batchId would make two concurrent
    * statements look like each other's crash replay. One definition
    * for every ad-hoc path (MergeSink's SQL INSERT/DELETE share it). */
  private def statementId(): Long = MergeSink.statementId()

  // ---- DML bucket pruning --------------------------------------------
  // A DML statement whose key evidence names the touched buckets must
  // not scan the whole store: a 10-row MERGE against a 100 TB target
  // rewrites O(touched buckets) — the read should cost the same. The
  // evidence is either literal key predicates (UPDATE/DELETE WHERE
  // k = …/k IN …) or a key-equality merge conjunct whose source side
  // hashes to a bounded bucket set (≤ nBuckets values, one map-side-
  // combined distinct over the source). Pruning only ever SHRINKS the
  // scan — the full condition still applies on top — so no evidence
  // simply means the former full-snapshot read.

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The writers' own routing hash for one INTERNAL-typed literal —
    * ONE definition with the scan builder's external-literal twin
    * ([[MergeSink.bucketForKeyLiteral]]), so routing and pruning can
    * never diverge. */
  private def bucketOfLiteral(value: Any,
      dt: org.apache.spark.sql.types.DataType, nBuckets: Long): Long =
    MergeSink.bucketForInternalLiteral(value, dt, nBuckets)

  /** Buckets pinned by LITERAL key predicates among `cond`'s conjuncts
    * (the DML twin of the scan builder's pruning walk). Conservative:
    * any shape beyond a foldable `k = v` / `k IN (…)` on the key
    * attribute — bare, or under a LOSSLESS WIDENING cast — yields no
    * evidence, never a wrong bucket.
    *
    * CAST TOLERANCE: type coercion rewrites `WHERE k = 5L` on an INT
    * key into `CAST(k AS BIGINT) = 5` — the key attribute hides under
    * an analyzer-inserted up-cast and the bare-attribute walk loses
    * the evidence. When the cast is a lossless widening
    * (`Cast.canUpCast` — injective by definition), the comparison
    * inverts exactly: the literal TRY-casts back to the key's own
    * type (`null` = no preimage = predicate matches nothing; stay
    * conservative) and the bucket comes from the same routing hash as
    * always. Narrowing/lossy casts (an explicit `CAST(k AS INT)` on a
    * BIGINT key) are NOT inverted — truncation makes multiple keys
    * collide on one literal, so pruning there could drop rows. */
  private def literalKeyValues(cond: Expression,
      keyAttr: Attribute): Option[Seq[Any]] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, EvalMode, In, Literal}
    def ofExprs(es: Seq[Expression]): Option[Seq[Any]] =
      if (!es.forall(e => e.foldable && e.dataType == keyAttr.dataType)) None
      else {
        val vals = es.map(_.eval(null)).filter(_ != null)
        if (vals.isEmpty) None // = NULL matches nothing; stay conservative
        else Some(vals)
      }
    // `cast(k as T) = v` with keyType →lossless→ T: map v back into the
    // key's type; the preimage is the pruning evidence
    def ofUpcast(vs: Seq[Expression], castType: org.apache.spark.sql.types.DataType)
        : Option[Seq[Any]] =
      if (!vs.forall(v => v.foldable && v.dataType == castType)) None
      else {
        val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        val backs = vs.flatMap { v =>
          Option(v.eval(null)).flatMap(value => Option(
            Cast(Literal(value, castType), keyAttr.dataType, tz, EvalMode.TRY)
              .eval(null)))
        }
        if (backs.isEmpty) None // no preimage: matches nothing; conservative
        else Some(backs)
      }
    object KeyUpcast {
      def unapply(e: Expression): Option[org.apache.spark.sql.types.DataType] =
        e match {
          case c @ Cast(a: Attribute, _, _, _)
              if a.exprId == keyAttr.exprId &&
                Cast.canUpCast(keyAttr.dataType, c.dataType) => Some(c.dataType)
          case _ => None
        }
    }
    val sets = conjuncts(cond).flatMap {
      case EqualTo(a: Attribute, v) if a.exprId == keyAttr.exprId =>
        ofExprs(Seq(v))
      case EqualTo(v, a: Attribute) if a.exprId == keyAttr.exprId =>
        ofExprs(Seq(v))
      case In(a: Attribute, vs) if a.exprId == keyAttr.exprId => ofExprs(vs)
      case EqualTo(KeyUpcast(dt), v) => ofUpcast(Seq(v), dt)
      case EqualTo(v, KeyUpcast(dt)) => ofUpcast(Seq(v), dt)
      case In(KeyUpcast(dt), vs) => ofUpcast(vs, dt)
      case _ => None
    }
    // conjunctive evidence intersects (internal-typed value equality)
    sets.map(_.distinct).reduceOption(_ intersect _)
  }

  /** Buckets pinned by literal key evidence — over the FULL (possibly
    * compound) key tuple: every component needs bounded equality
    * evidence among the conjuncts; the bucket set is the routing hash
    * of the cross product (capped at 64 tuples — wider scans unpruned,
    * never wrong). An intersection proven EMPTY for some component
    * prunes to the empty scan (the predicate matches nothing). */
  private def literalKeyBuckets(cond: Expression, keyAttrs: Seq[Attribute],
      nBuckets: Long): Option[Set[Long]] = {
    val per = keyAttrs.map(a => literalKeyValues(cond, a))
    if (per.exists(_.isEmpty)) return None
    val lists = per.map(_.get)
    if (lists.map(_.size.toLong).product > 64L) return None
    val tuples = lists.foldLeft(Seq(Seq.empty[Any]))((acc, l) =>
      for { t <- acc; v <- l } yield t :+ v)
    Some(tuples.map(t => MergeSink.bucketForInternalTuple(
      t.zip(keyAttrs.map(_.dataType)), nBuckets)).toSet)
  }

  /** The analyzed condition's conjuncts translated to V1 filters — the
    * DML victim scan's FILE-SKIPPING evidence (VERDICT r15 #1): the
    * same `_stats` sidecar pruning a SELECT's pushed filters drive,
    * fed from the DML predicate instead. Only conjuncts whose
    * references are all target-side translate (a MERGE condition mixes
    * in source attributes); untranslatable shapes simply contribute no
    * evidence. Conjunctive semantics make any subset sound — the full
    * condition always re-applies on top of the pruned scan. */
  private def fileSkipFilters(cond: Expression,
      targetRefs: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Seq[org.apache.spark.sql.sources.Filter] =
    conjuncts(cond)
      .filter(_.references.subsetOf(targetRefs))
      .flatMap(e => org.apache.spark.sql.execution.datasources
        .DataSourceStrategy.translateFilter(foldConstants(e),
          supportNestedPredicatePushdown = false))

  /** ANALYZED (not optimized) conditions carry literals under unfolded
    * coercion casts (`v >= CAST(3000 AS BIGINT)`), which
    * `translateFilter` refuses — the V2 pushdown path only sees folded
    * shapes because it runs after the optimizer. Fold foldable
    * subtrees to literals here (foldable implies deterministic, so
    * eval is safe at plan time). */
  private def foldConstants(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    e.transformUp {
      case l: Literal => l
      case x if x.foldable => Literal(x.eval(null), x.dataType)
    }
  }

  /** The target relation replaced by its BUCKET-PRUNED (and, when the
    * condition yields evidence, FILE-PRUNED) snapshot read, with
    * `rel`'s output exprIds preserved (aliasing each pruned column
    * back to the original attribute id), so every analyzed condition /
    * assignment expression keeps resolving unchanged. */
  private def prunedRelPlan(spark: org.apache.spark.sql.classic.SparkSession,
      dir: String, rel: DataSourceV2Relation, buckets: Set[Long],
      filters: Seq[org.apache.spark.sql.sources.Filter]): LogicalPlan = {
    val pruned = MergeSink.prunedSnapshot(spark, dir, buckets, filters)
      .asInstanceOf[Dataset[Row]].queryExecution.analyzed
    val byName = pruned.output.map(a => a.name -> a).toMap
    Project(rel.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(
        byName(a.name), a.name)(exprId = a.exprId)), pruned)
  }

  /** UPDATE's and DELETE's shared matched-row plan: literal key
    * predicates among the analyzed condition's conjuncts prune the
    * target scan to the owning buckets, and every translatable conjunct
    * prunes FILES through the `_stats` sidecars; the condition still
    * applies in full on top. With NO bucket evidence the original DSv2
    * plan is kept — Spark's own V2 pushdown hands the same conjuncts to
    * the scan builder there, so that path file-prunes already. */
  private def prunedMatchedPlan(spark: org.apache.spark.sql.classic.SparkSession,
      dir: String, matchedPlan: LogicalPlan,
      keyAttrs: Seq[Attribute]): LogicalPlan = matchedPlan match {
    case f @ Filter(c, r: DataSourceV2Relation) =>
      MergeSink.storedNBuckets(dir)
        .flatMap(nb => literalKeyBuckets(c, keyAttrs, nb))
        .map { bs =>
          val skip = fileSkipFilters(c,
            org.apache.spark.sql.catalyst.expressions.AttributeSet(r.output))
          Filter(c, prunedRelPlan(spark, dir, r, bs, skip)): LogicalPlan
        }
        .getOrElse(f)
    case other => other
  }

  case class GraftUpdateCommand(dir: String,
      relOutput: Seq[Attribute], matchedPlan: LogicalPlan,
      assignments: Seq[Assignment])
      extends LeafRunnableCommand {
    override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
      Seq(matchedPlan)
    override def run(sparkApi: SparkSession): Seq[Row] = {
      val spark = sparkApi.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val keyName = GraftDml.keyNameOf(dir, relOutput.map(_.name))
      val keyNames = MergeSink.keyCols(keyName)
      val byName = assignments
        .map(a => assignName(a.key) -> a.value).toMap
      val reKeyed = keyNames.filter(byName.contains)
      require(reKeyed.isEmpty,
        s"graft: UPDATE may not reassign key column(s) " +
          s"${reKeyed.mkString(", ")} — a keyed store's row identity is " +
          "immutable; DELETE + INSERT expresses a re-key explicitly")
      val attrOf = relOutput.map(a => a.name -> a).toMap
      val valueAttrs = relOutput.filterNot(a => keyNames.contains(a.name))
      def updated() = Dataset.ofRows(spark,
        prunedMatchedPlan(spark, dir, matchedPlan,
          keyNames.map(attrOf))).select(
        keyNames.map(k => Bridge.column(attrOf(k)).as(k)) ++
          (lit("upsert").as("_op") +: lit(0L).as("_ver") +:
          valueAttrs.map { f =>
            byName.get(f.name)
              .map(e => Bridge.column(e).cast(f.dataType))
              .getOrElse(Bridge.column(attrOf(f.name)))
              .as(f.name)
          }): _*)
      commitCdc(spark, dir, () => updated(), keyName,
        valueAttrs.map(_.name), "UPDATE")
      Seq.empty
    }
  }

  /** `DELETE FROM … WHERE <any condition>` — a HEAD delete (one CDC
    * retraction commit; history keeps the rows), with the same
    * statement-level OCC, literal-key bucket pruning and key-registry
    * handling as UPDATE. Subsumes the DSv2 `SupportsDelete` path in
    * extension sessions; that door remains for translatable filters
    * without the extensions. */
  case class GraftDeleteCommand(dir: String, relOutput: Seq[Attribute],
      matchedPlan: LogicalPlan) extends LeafRunnableCommand {
    override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
      Seq(matchedPlan)
    override def run(sparkApi: SparkSession): Seq[Row] = {
      val spark = sparkApi.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val keyName = GraftDml.keyNameOf(dir, relOutput.map(_.name))
      val keyNames = MergeSink.keyCols(keyName)
      val attrOf = relOutput.map(a => a.name -> a).toMap
      val valueAttrs = relOutput.filterNot(a => keyNames.contains(a.name))
      def victims() = Dataset.ofRows(spark,
        prunedMatchedPlan(spark, dir, matchedPlan,
          keyNames.map(attrOf))).select(
        keyNames.map(k => Bridge.column(attrOf(k)).as(k)) ++
          (lit("delete").as("_op") +: lit(0L).as("_ver") +:
          valueAttrs.map(f => lit(null).cast(f.dataType).as(f.name))): _*)
      // a DELETE's CDC batch is pure retraction — it commits as a
      // deletion-vector sidecar (O(metadata)), never a bucket rewrite
      commitCdc(spark, dir, () => victims(), keyName,
        valueAttrs.map(_.name), "DELETE", deleteOnly = true)
      Seq.empty
    }
  }

  case class GraftMergeCommand(rel: DataSourceV2Relation, dir: String,
      source: LogicalPlan, cond: Expression,
      matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
      notMatchedBySourceActions: Seq[MergeAction])
      extends LeafRunnableCommand {

    /** First-action-wins chains: `_op` and each value column fold the
      * arm's actions right-to-left so the FIRST action's `when` sits
      * outermost; a row matching no action yields a null `_op` and is
      * filtered out (no CDC row = untouched). */
    private def armColumns(actions: Seq[MergeAction],
        fields: Seq[org.apache.spark.sql.types.StructField],
        current: String => Column): (Column, Seq[Column]) = {
      def condOf(c: Option[Expression]): Column =
        c.map(Bridge.column).getOrElse(lit(true))
      val op = actions.foldRight(lit(null).cast("string")) { (a, els) =>
        a match {
          case d: DeleteAction => when(condOf(d.condition), lit("delete")).otherwise(els)
          case u: UpdateAction => when(condOf(u.condition), lit("upsert")).otherwise(els)
          case i: InsertAction => when(condOf(i.condition), lit("upsert")).otherwise(els)
          case other => throw new UnsupportedOperationException(
            s"graft: unsupported MERGE action $other")
        }
      }
      val values = fields.map { f =>
        actions.foldRight(lit(null).cast(f.dataType)) { (a, els) =>
          a match {
            case d: DeleteAction =>
              when(condOf(d.condition), lit(null).cast(f.dataType)).otherwise(els)
            case u: UpdateAction =>
              val am = u.assignments.map(x => assignName(x.key) -> x.value).toMap
              val v = am.get(f.name).map(e => Bridge.column(e).cast(f.dataType))
                .getOrElse(current(f.name))
              when(condOf(u.condition), v).otherwise(els)
            case i: InsertAction =>
              val am = i.assignments.map(x => assignName(x.key) -> x.value).toMap
              val v = am.get(f.name).map(e => Bridge.column(e).cast(f.dataType))
                .getOrElse(lit(null).cast(f.dataType))
              when(condOf(i.condition), v).otherwise(els)
            case other => throw new UnsupportedOperationException(
              s"graft: unsupported MERGE action $other")
          }
        }
      }
      (op, values)
    }

    /** UPDATE actions may not RE-KEY a row (same contract plain UPDATE
      * enforces loudly). `SET *` legitimately assigns the key column —
      * under the usual `ON t.k = s.k` it is an identity assignment — so
      * the refusal is a per-row RUNTIME check on the FIRING action's
      * assigned value, not a static throw that would break `SET *`:
      * folding first-action-wins, the key the actions would write is
      * compared (null-safely) with the row's actual key, and any
      * difference raises the same "key column is immutable" error. */
    private def guardedKey(actions: Seq[MergeAction], keyName: String,
        keyType: org.apache.spark.sql.types.DataType,
        keyCol: Column): Column = {
      val assignsKey = actions.exists {
        case u: UpdateAction =>
          u.assignments.exists(a => assignName(a.key) == keyName)
        case _ => false
      }
      if (!assignsKey) keyCol
      else {
        val assigned = actions.foldRight(keyCol) { (a, els) =>
          a match {
            case u: UpdateAction =>
              val am = u.assignments.map(x => assignName(x.key) -> x.value).toMap
              val v = am.get(keyName).map(e => Bridge.column(e).cast(keyType))
                .getOrElse(keyCol)
              when(u.condition.map(Bridge.column).getOrElse(lit(true)), v)
                .otherwise(els)
            case d: DeleteAction =>
              when(d.condition.map(Bridge.column).getOrElse(lit(true)), keyCol)
                .otherwise(els)
            case _ => els
          }
        }
        when(!(assigned <=> keyCol), org.apache.spark.sql.functions.raise_error(
          lit(s"graft: MERGE may not reassign the key column '$keyName' — " +
            "a keyed store's row identity is immutable; DELETE + INSERT " +
            "expresses a re-key explicitly")).cast(keyType))
          .otherwise(keyCol)
      }
    }

    override def run(sparkApi: SparkSession): Seq[Row] = {
      val spark = sparkApi.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val allFields = rel.schema.fields.toSeq
      val keyName = GraftDml.keyNameOf(dir, allFields.map(_.name))
      val keyNames = MergeSink.keyCols(keyName)
      val keyFields = keyNames.map(n => allFields.find(_.name == n).get)
      val valueFields = allFields.filterNot(f => keyNames.contains(f.name))
      val valueNames = valueFields.map(_.name)
      val attrOf = rel.output.map(a => a.name -> a).toMap
      val keyColsOf = keyNames.map(n => Bridge.column(attrOf(n)))
      val condCol = Bridge.column(cond)
      def cdcSelect(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
          op: Column, values: Seq[Column]) =
        df.select(keys.zip(keyNames).map { case (c, n) => c.as(n) } ++
          (op.as("_op") +: lit(0L).as("_ver") +:
          values.zip(valueNames).map { case (c, n) => c.as(n) }): _*)
          .filter(new Column("_op").isNotNull)
      // source-side key expressions from top-level `t.k_i = <src>`
      // merge conjuncts — bucket evidence exists only when EVERY key
      // component has one (the routing hash covers the full tuple)
      val srcKeyExprs: Option[Seq[Expression]] = {
        import org.apache.spark.sql.catalyst.expressions.EqualTo
        val srcOut = org.apache.spark.sql.catalyst.expressions
          .AttributeSet(source.output)
        val per = keyNames.map { n =>
          val keyAttr = attrOf(n)
          conjuncts(cond).collectFirst {
            case EqualTo(a: Attribute, e)
                if a.exprId == keyAttr.exprId && e.references.subsetOf(srcOut) => e
            case EqualTo(e, a: Attribute)
                if a.exprId == keyAttr.exprId && e.references.subsetOf(srcOut) => e
          }
        }
        if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
      }
      // the whole CDC batch is a CLOSURE: commitCdc re-derives it from
      // a fresh head read when its declared read point goes stale
      def deriveCdc(): org.apache.spark.sql.DataFrame = {
        val src = Dataset.ofRows(spark, source)
        // the buckets this MERGE can touch on the equi-matched arms:
        // hash the source's key expression with the writers' own
        // routing (one map-side-combined distinct, ≤ nBuckets values),
        // so a small-source MERGE reads O(owning buckets) of the
        // target, not the whole store
        val touched: Option[Set[Long]] = for {
          nB <- MergeSink.storedNBuckets(dir)
          kes <- srcKeyExprs
        } yield src.select(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(
              kes.map(Bridge.column): _*),
            lit(nB)).as("_b"))
          .distinct().collect().map(_.getLong(0)).toSet
        // matched/not-matched arms only ever see target rows whose key
        // equals some source key — the pruned read is exact for them;
        // the BY SOURCE arm classifies every target row and keeps the
        // full snapshot. Target-only conjuncts of the merge condition
        // additionally FILE-prune through the `_stats` sidecars: a
        // target row a skipped file would have held fails that conjunct,
        // so it can match no source row — both the inner and the
        // left-anti arm are unchanged by the skip.
        val prunedTarget = touched match {
          case Some(bs) =>
            val skip = fileSkipFilters(cond,
              org.apache.spark.sql.catalyst.expressions.AttributeSet(rel.output))
            Dataset.ofRows(spark, prunedRelPlan(spark, dir, rel, bs, skip))
          case None => Dataset.ofRows(spark, rel)
        }
        def fullTarget = Dataset.ofRows(spark, rel)
        // matched arm: inner join; the multiple-source-rows check is the
        // commit-level duplicate-key refusal in commitCdc
        val matchedCdc =
          if (matchedActions.isEmpty) None
          else {
            val pairs = prunedTarget.join(src, condCol, "inner")
            val (op, values) = armColumns(matchedActions, valueFields,
              n => Bridge.column(attrOf(n)))
            val guarded = keyNames.zip(keyFields).zip(keyColsOf).map {
              case ((n, f), c) => guardedKey(matchedActions, n, f.dataType, c)
            }
            Some(cdcSelect(pairs, guarded, op, values))
          }
        // not-matched arm (inserts): source rows with no target match;
        // the key comes from the insert assignments
        val notMatchedCdc =
          if (notMatchedActions.isEmpty) None
          else {
            val lone = src.join(prunedTarget, condCol, "left_anti")
            def keyFromInsert(n: String,
                f: org.apache.spark.sql.types.StructField): Column =
              notMatchedActions.foldRight(lit(null).cast(f.dataType)) {
                (a, els) => a match {
                  case i: InsertAction =>
                    val am = i.assignments.map(x => assignName(x.key) -> x.value).toMap
                    val v = am.get(n).map(e =>
                      Bridge.column(e).cast(f.dataType)).getOrElse(
                      throw new UnsupportedOperationException(
                        s"graft: MERGE INSERT must assign the key column '$n'"))
                    when(i.condition.map(Bridge.column).getOrElse(lit(true)), v)
                      .otherwise(els)
                  case other => throw new UnsupportedOperationException(
                    s"graft: only INSERT actions are valid WHEN NOT MATCHED (got $other)")
                }
              }
            val (op, values) = armColumns(notMatchedActions, valueFields,
              _ => lit(null))
            Some(cdcSelect(lone,
              keyNames.zip(keyFields).map { case (n, f) => keyFromInsert(n, f) },
              op, values))
          }
        // not-matched-by-source arm: target rows with no source match
        val nmbsCdc =
          if (notMatchedBySourceActions.isEmpty) None
          else {
            val lone = fullTarget.join(src, condCol, "left_anti")
            val (op, values) = armColumns(notMatchedBySourceActions, valueFields,
              n => Bridge.column(attrOf(n)))
            val guarded = keyNames.zip(keyFields).zip(keyColsOf).map {
              case ((n, f), c) =>
                guardedKey(notMatchedBySourceActions, n, f.dataType, c)
            }
            Some(cdcSelect(lone, guarded, op, values))
          }
        Seq(matchedCdc, notMatchedCdc, nmbsCdc).flatten.reduce(_ unionByName _)
      }
      if (matchedActions.nonEmpty || notMatchedActions.nonEmpty ||
        notMatchedBySourceActions.nonEmpty)
        commitCdc(spark, dir, () => deriveCdc(), keyName, valueNames, "MERGE")
      Seq.empty
    }
  }
}
