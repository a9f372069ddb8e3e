package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft._

/** SQL front door for the native expression library (SURVEY §3.2: the
  * DataFrame DSL and SQL text reach the identical Catalyst pipeline).
  * Register via `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`; the
  * sketch/vector expressions then resolve in plain SQL:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_simhash60(tokens), graft_minhash_md5(shingles, 8) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def checkArity(name: String, args: Seq[Expression], arity: Int): Unit =
    if (args.length != arity)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$name`", "expectedNum" -> arity.toString,
        "actualNum" -> args.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))

  private def one(name: String)(f: Expression => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(arr)"),
      (args: Seq[Expression]) => { checkArity(name, args, 1); f(args.head) })

  private def two(name: String)(f: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(a, b)"),
      (args: Seq[Expression]) => { checkArity(name, args, 2); f(args(0), args(1)) })

  /** Extracts argument `pos` of `name` as a foldable INT/BIGINT value,
    * failing analysis (not execution) with a standard-error-class
    * AnalysisException on wrong arity, a non-foldable expression, a
    * NULL, or a non-integral type — `graft_minhash_md5(sh, 8L)` and
    * `CAST(8 AS BIGINT)` both work. */
  private def intLit(name: String, args: Seq[Expression], pos: Int,
      arity: Int): Int = {
    checkArity(name, args, arity)
    val e = args(pos)
    val param = s"arg${pos + 1}"
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$name`", "paramName" -> s"`$param`",
        "paramType" -> "\"INT\""))
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$name`"))
      case other =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$name`",
          "invalidValue" -> s"${e.dataType.sql}: $other"))
    }
  }

  /** [[intLit]]'s DOUBLE counterpart (INT literals widen) — for the
    * smoothing parameters of the trend folds. */
  private def dblLit(name: String, args: Seq[Expression], pos: Int,
      arity: Int): Double = {
    checkArity(name, args, arity)
    val e = args(pos)
    val param = s"arg${pos + 1}"
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$name`", "paramName" -> s"`$param`",
        "paramType" -> "\"DOUBLE\""))
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$name`"))
      case other =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.DOUBLE", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$name`",
          "invalidValue" -> s"${e.dataType.sql}: $other"))
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // DML verbs over graft stores: UPDATE / MERGE INTO rewrite into
    // CDC commits through the store's OCC protocol (GraftDml scaladoc)
    ext.injectResolutionRule(org.apache.spark.sql.graft.GraftDml.GraftDmlRule)
    // store-scan statistics for the STATIC join planner: forward the
    // graft scan's true (pruning-aware) bytes + row counts past
    // V1ScanWrapper so a dim-sized store read plans broadcast without
    // waiting for AQE (GraftStats scaladoc). The swap must run AFTER
    // V2ScanRelationPushDown creates the wrapper, but every
    // extension-injectable logical batch ("Pre CBO Rules" included)
    // sits BEFORE "Early Filter and Projection Push-Down" in this
    // Spark — so the builder registers the rule in the
    // end-of-optimizer "User Provided Optimizers" batch through the
    // public ExperimentalMethods API (once per session), and the
    // pre-CBO slot keeps a no-op-until-pushdown copy for plan shapes
    // that already carry a scan relation.
    ext.injectPreCBORule { session =>
      val already = session.experimental.extraOptimizations
        .exists(_.isInstanceOf[org.apache.spark.sql.graft.GraftStatsRule])
      if (!already)
        session.experimental.extraOptimizations ++=
          Seq(org.apache.spark.sql.graft.GraftStatsRule(session))
      org.apache.spark.sql.graft.GraftStatsRule(session)
    }
    // maintenance verbs (DESCRIBE HISTORY / OPTIMIZE / VACUUM /
    // RESTORE TABLE): a delegating parser recognizing exactly those
    // statements — none of which vanilla Spark parses — and handing
    // everything else through verbatim (GraftMaintenanceSql scaladoc)
    ext.injectParser((session, delegate) =>
      new org.apache.spark.sql.graft.GraftSqlParser(session, delegate))
    ext.injectFunction(two("graft_cosine")(CosineSimExpr(_, _)))
    ext.injectFunction(two("graft_dot")(DotProductExpr(_, _)))
    ext.injectFunction(one("graft_simhash60")(SimHash60Expr(_)))
    ext.injectFunction(two("graft_sorted_intersect_count")(SortedLongIntersectCountExpr(_, _)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_md5"),
      info("graft_minhash_md5", "graft_minhash_md5(shingles, numHashes)"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0),
        intLit("graft_minhash_md5", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_xx"),
      info("graft_minhash_xx", "graft_minhash_xx(shingles, numHashes)"),
      (args: Seq[Expression]) => XxMinHashSigExpr(args(0),
        intLit("graft_minhash_xx", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_rhp_bucket"),
      info("graft_rhp_bucket", "graft_rhp_bucket(vec, bits, dim)"),
      (args: Seq[Expression]) => RhpBucketExpr(args(0),
        intLit("graft_rhp_bucket", args, 1, 3),
        intLit("graft_rhp_bucket", args, 2, 3))))
    ext.injectFunction((FunctionIdentifier("graft_hashed_shingles"),
      info("graft_hashed_shingles", "graft_hashed_shingles(loweredText, k)"),
      (args: Seq[Expression]) => HashedShinglesExpr(args(0),
        intLit("graft_hashed_shingles", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_long"),
      info("graft_minhash_long", "graft_minhash_long(hashedSet, numHashes)"),
      (args: Seq[Expression]) => LongMinHashSigExpr(args(0),
        intLit("graft_minhash_long", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_md5_paired"),
      info("graft_minhash_md5_paired", "graft_minhash_md5_paired(shingles, numHashes)"),
      (args: Seq[Expression]) => MinHashSigPairedExpr(args(0),
        intLit("graft_minhash_md5_paired", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_md5_mul"),
      info("graft_minhash_md5_mul", "graft_minhash_md5_mul(shingles, numHashes)"),
      (args: Seq[Expression]) => MinHashSigMulExpr(args(0),
        intLit("graft_minhash_md5_mul", args, 1, 2))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_md5_mul_text"),
      info("graft_minhash_md5_mul_text",
        "graft_minhash_md5_mul_text(loweredText, k, numHashes)"),
      (args: Seq[Expression]) => MinHashSigMulTextExpr(args(0),
        intLit("graft_minhash_md5_mul_text", args, 1, 3),
        intLit("graft_minhash_md5_mul_text", args, 2, 3))))
    // the DEFAULT merge table (literal data in TextFunctions) — a SQL
    // user gets the same tokenizer the curation queries budget with
    ext.injectFunction((FunctionIdentifier("graft_bpe_merged_count"),
      info("graft_bpe_merged_count", "graft_bpe_merged_count(text)"),
      (args: Seq[Expression]) => {
        checkArity("graft_bpe_merged_count", args, 1)
        BpeMergedCountExpr(args.head,
          graft.functions.TextFunctions.DefaultBpeMerges.map(_._1),
          graft.functions.TextFunctions.DefaultBpeMerges.map(_._2),
          graft.functions.TextFunctions.BpePattern)
      }))
    ext.injectFunction((FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode", "graft_bpe_encode(text)"),
      (args: Seq[Expression]) => {
        checkArity("graft_bpe_encode", args, 1)
        BpeEncodeExpr(args.head,
          graft.functions.TextFunctions.DefaultBpeMerges.map(_._1),
          graft.functions.TextFunctions.DefaultBpeMerges.map(_._2),
          graft.functions.TextFunctions.BpePattern)
      }))
    ext.injectFunction((FunctionIdentifier("graft_byte_at"),
      info("graft_byte_at", "graft_byte_at(bin, offset1)"),
      (args: Seq[Expression]) => ByteAtExpr(args(0),
        intLit("graft_byte_at", args, 1, 2))))
    // the trend folds (w15/w15b) for SQL users: same native expressions
    // the DSL operators wrap, parameters as foldable literals
    ext.injectFunction((FunctionIdentifier("graft_holt_states"),
      info("graft_holt_states", "graft_holt_states(series, alpha, beta)"),
      (args: Seq[Expression]) => HoltStatesExpr(args(0),
        dblLit("graft_holt_states", args, 1, 3),
        dblLit("graft_holt_states", args, 2, 3))))
    ext.injectFunction((FunctionIdentifier("graft_holt_winters_states"),
      info("graft_holt_winters_states",
        "graft_holt_winters_states(series, alpha, beta, gamma, period)"),
      (args: Seq[Expression]) => HoltWintersStatesExpr(args(0),
        dblLit("graft_holt_winters_states", args, 1, 5),
        dblLit("graft_holt_winters_states", args, 2, 5),
        dblLit("graft_holt_winters_states", args, 3, 5),
        intLit("graft_holt_winters_states", args, 4, 5))))
    // Composition ops built from catalyst nodes directly: wrapping the
    // public Column API via Bridge.expression would leave an
    // unresolvable ColumnNodeExpression inside the function builder
    // (Spark 4 column-node architecture), so these mirror the DSL
    // formulas node-for-node; SqlFrontDoorSpec pins SQL == DSL values.
    ext.injectFunction((FunctionIdentifier("graft_zvalue"),
      info("graft_zvalue", "graft_zvalue(x, y, bits)"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, ShiftLeft, ShiftRight}
        import org.apache.spark.sql.types.LongType
        val bits = intLit("graft_zvalue", args, 2, 3)
        if (bits < 1 || bits > 31)
          throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
            "parameter" -> "`arg3`", "functionName" -> "`graft_zvalue`",
            "invalidValue" -> s"bits must be in [1, 31]: $bits"))
        val xl = Cast(args(0), LongType); val yl = Cast(args(1), LongType)
        (0 until bits).map { i =>
          BitwiseOr(
            ShiftLeft(BitwiseAnd(ShiftRight(xl, Literal(i)), Literal(1L)), Literal(2 * i)),
            ShiftLeft(BitwiseAnd(ShiftRight(yl, Literal(i)), Literal(1L)), Literal(2 * i + 1)))
        }.reduceLeft[Expression]((a, b) => BitwiseOr(a, b)) }))
    ext.injectFunction((FunctionIdentifier("graft_bpe_count"),
      info("graft_bpe_count", "graft_bpe_count(text)"),
      (args: Seq[Expression]) => { checkArity("graft_bpe_count", args, 1)
        import org.apache.spark.sql.catalyst.expressions.{RegExpExtractAll, Size}
        Size(RegExpExtractAll(args(0),
          Literal(graft.functions.TextFunctions.BpePattern), Literal(0))) }))
    ext.injectFunction((FunctionIdentifier("graft_cdc_chunks"),
      info("graft_cdc_chunks", "graft_cdc_chunks(text, maskBits, minLen, maxLen)"),
      (args: Seq[Expression]) => CdcChunksExpr(args(0),
        intLit("graft_cdc_chunks", args, 1, 4),
        intLit("graft_cdc_chunks", args, 2, 4),
        intLit("graft_cdc_chunks", args, 3, 4))))
    ext.injectFunction((FunctionIdentifier("graft_normalize_text"),
      info("graft_normalize_text", "graft_normalize_text(text)"),
      (args: Seq[Expression]) => { checkArity("graft_normalize_text", args, 1)
        import org.apache.spark.sql.catalyst.expressions.{Lower, RegExpReplace, StringTranslate, StringTrim}
        import graft.functions.TextFunctions.{AccentFolded, AccentedChars}
        StringTrim(RegExpReplace(
          RegExpReplace(
            StringTranslate(Lower(args(0)),
              Literal(AccentedChars), Literal(AccentFolded)),
            Literal("[\\x00-\\x1F\\x7F]"), Literal(" "), Literal(1)),
          Literal(" +"), Literal(" "), Literal(1))) }))
    // URL family (L2k/L4m): resolved catalyst trees mirroring
    // UrlFunctions (the Bridge round-trip would leave unresolved
    // column nodes inside injectFunction, which never re-analyze)
    def urlHostExpr(u: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.{Lower, ParseUrl}
      Lower(ParseUrl(Seq(u, Literal("HOST")), failOnError = false))
    }
    ext.injectFunction(one("graft_url_host")(urlHostExpr))
    ext.injectFunction(one("graft_registered_domain")(u => {
      import org.apache.spark.sql.catalyst.expressions.RegExpExtract
      RegExpExtract(urlHostExpr(u), Literal("([^.]+\\.[^.]+)$"), Literal(1))
    }))
    ext.injectFunction(one("graft_canonical_url")(u => {
      import org.apache.spark.sql.catalyst.expressions.{Coalesce, Concat, ParseUrl, RegExpReplace}
      Concat(Seq(urlHostExpr(u),
        RegExpReplace(
          Coalesce(Seq(ParseUrl(Seq(u, Literal("PATH")), failOnError = false),
            Literal(""))),
          Literal("/+$"), Literal(""), Literal(1))))
    }))
  }
}
