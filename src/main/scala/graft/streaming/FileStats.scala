package graft.streaming

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import graft.store.{StoreFiles => Files, StorePath => Path}

import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String

/** MANIFEST-LEVEL DATA SKIPPING for the bucketed store — the
  * Delta/Iceberg stats-in-log pattern (reference analytics are
  * time-windowed, README.md:17; without file stats a range query must
  * open every live file's footer — millions of object-store GETs at
  * 100 TB). At commit time the publishing writer reads the FOOTERS of
  * exactly the files it just wrote (metadata-only, no data re-read)
  * and records per-file row counts and per-column min/max/null-counts
  * in a `_stats/<version>` sidecar; at scan time the SQL front door
  * prunes files whose recorded ranges provably exclude the pushed
  * predicates — BEFORE any footer is fetched.
  *
  * Safety contract (what keeps this advisory metadata from ever
  * changing results):
  *   - a file PRESENT on disk but ABSENT from the sidecar is always
  *     scanned (erasure rewrites bucket dirs in place with new file
  *     names; the erasure path refreshes sidecars, but an interrupted
  *     refresh merely loses skipping, never rows);
  *   - recorded ranges are SUPERSETS of the live file's content under
  *     every sanctioned in-place mutation (erasure only deletes rows),
  *     so stale stats can only fail to skip, never wrongly skip;
  *   - a column with unreliable footer stats (missing, truncated-away,
  *     NaN bounds, INT96 timestamps) is simply not recorded;
  *   - an unparsable or version-unknown sidecar reads as "no stats".
  *
  * Values are compared in each kind's native domain: integral and
  * date/time kinds as longs, floats as doubles (`+ 0.0` normalizes
  * the IEEE −0.0/0.0 split on BOTH sides, and NaN bounds are refused
  * at record time), strings in UTF-8 BINARY order ([[UTF8String]] —
  * the same order parquet's unsigned comparator recorded them in,
  * where `String.compareTo`'s UTF-16 order would disagree on
  * supplementary characters). */
private[graft] object FileStats {

  /** Sidecar format version — bump on any incompatible change; a
    * reader seeing an unknown header treats the store as stats-less. */
  private val FormatHeader = "#filestats 1"

  /** Comparison domains. `l` integral long, `d` double, `s` UTF-8
    * string, `t` timestamp micros, `dt` date days. */
  private val Kinds = Set("l", "d", "s", "t", "dt")

  /** min/max are tokens in the kind's rendered domain; `hasValues`
    * false = every row NULL (min/max meaningless). `nulls` is the
    * column's null count (exact at record time; an upper-bound
    * superset invariant is NOT needed for nulls because in-place
    * erasure can only delete rows, and IsNull-skipping keys on
    * `nulls == 0`, which row deletion preserves). */
  final case class ColStats(kind: String, min: String, max: String,
      nulls: Long, hasValues: Boolean)

  /** One written file: path RELATIVE to the version dir (e.g.
    * `_bucket=7/part-00000-….parquet`), its row count, and the
    * per-column stats the footer yielded. */
  final case class FileEntry(rel: String, rows: Long,
      cols: Map[String, ColStats])

  // ------------------------------------------------------------------
  // Collection (commit time: footers of just-written files)
  // ------------------------------------------------------------------

  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Walk `root` recursively and footer-read every `*.parquet` file.
    * Any per-file failure drops THAT file's entry (it will simply
    * never be skipped); the caller wraps the whole collection so a
    * stats failure can never fail a commit. Footers read from a small
    * bounded pool — the reads are independent metadata GETs and a
    * commit should not serialize on them (the pass bills every store
    * build otherwise; deterministic output via the final sort). */
  def collect(root: Path): Seq[FileEntry] = {
    val conf = hadoopConf()
    def files(dir: Path, prefix: String): Seq[(Path, String)] = {
      val children =
        try {
          val s0 = Files.list(dir)
          try s0.iterator().asScala.toList finally s0.close()
        } catch { case _: java.io.IOException => return Seq.empty }
      children.sortBy(_.toString).flatMap { c =>
        val name = c.getFileName.toString
        if (Files.isDirectory(c)) files(c, s"$prefix$name/")
        else if (name.endsWith(".parquet")) Seq((c, s"$prefix$name"))
        else Nil
      }
    }
    val fs = files(root, "")
    if (fs.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(8, fs.size))
    try fs.map { case (p, rel) =>
      pool.submit(new java.util.concurrent.Callable[Option[FileEntry]] {
        def call(): Option[FileEntry] =
          try Some(fromFooter(p, rel, conf))
          catch { case scala.util.control.NonFatal(_) => None }
      })
    }.flatMap(_.get()).sortBy(_.rel)
    finally pool.shutdown()
  }

  /** One file's footer → entry. Row-group stats merge per column;
    * a column whose ANY row group lacks usable stats is dropped. */
  private def fromFooter(file: Path, rel: String,
      conf: org.apache.hadoop.conf.Configuration): FileEntry = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toString), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // per-column accumulation across row groups
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, Option[ColStats]]
      for (b <- blocks; cc <- b.getColumns.asScala) {
        if (cc.getPath.size == 1) { // top-level scalar columns only
          val name = cc.getPath.toDotString
          val merged = kindOf(cc.getPrimitiveType) match {
            case None => None
            case Some(kind) =>
              val st = cc.getStatistics
              if (st == null || st.isEmpty || st.getNumNulls < 0) None
              else {
                val chunk =
                  if (!st.hasNonNullValue)
                    Some(ColStats(kind, "", "", st.getNumNulls,
                      hasValues = false))
                  else for {
                    mn <- renderStat(kind, st, isMin = true)
                    mx <- renderStat(kind, st, isMin = false)
                  } yield ColStats(kind, mn, mx, st.getNumNulls,
                    hasValues = true)
                (acc.get(name), chunk) match {
                  case (None, c) => c // first row group
                  case (Some(None), _) => None // already poisoned
                  case (_, None) => None
                  case (Some(Some(a)), Some(c)) =>
                    if (a.kind != c.kind) None
                    else Some(merge(a, c))
                }
              }
          }
          acc.update(name, merged)
        }
      }
      FileEntry(rel, rows,
        acc.collect { case (n, Some(st)) => (n, st) }.toMap)
    } finally reader.close()
  }

  private def merge(a: ColStats, b: ColStats): ColStats = {
    val nulls = a.nulls + b.nulls
    if (!a.hasValues && !b.hasValues) a.copy(nulls = nulls)
    else if (!a.hasValues) b.copy(nulls = nulls)
    else if (!b.hasValues) a.copy(nulls = nulls)
    else ColStats(a.kind,
      if (compareTokens(a.kind, a.min, b.min) <= 0) a.min else b.min,
      if (compareTokens(a.kind, a.max, b.max) >= 0) a.max else b.max,
      nulls, hasValues = true)
  }

  /** Physical+logical parquet type → comparison domain. Types whose
    * footer ordering or decoding is not bulletproof (INT96, decimals,
    * unsigned ints, nested paths) are not recorded. */
  private def kindOf(pt: org.apache.parquet.schema.PrimitiveType)
      : Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val lt = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 => lt match {
        case null => Some("l")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned => Some("l")
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some("dt")
        case _ => None
      }
      case INT64 => lt match {
        case null => Some("l")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned => Some("l")
        case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          Some("t")
        case _ => None
      }
      case FLOAT | DOUBLE => Some("d")
      case BINARY => lt match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some("s")
        case _ => None
      }
      case _ => None
    }
  }

  /** Footer statistic → canonical token in the kind's domain.
    * None = unreliable (NaN bounds). Timestamp units normalize to
    * MICROS with floor division — monotone, so bounds stay bounds. */
  private def renderStat(kind: String,
      st: org.apache.parquet.column.statistics.Statistics[_],
      isMin: Boolean): Option[String] = {
    import org.apache.parquet.column.statistics._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    (kind, st) match {
      case ("l" | "dt", s: IntStatistics) =>
        Some((if (isMin) s.getMin.toLong else s.getMax.toLong).toString)
      case ("l", s: LongStatistics) =>
        Some((if (isMin) s.getMin else s.getMax).toString)
      case ("t", s: LongStatistics) =>
        val raw = if (isMin) s.getMin else s.getMax
        val unit = s.`type`().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit
          case _ => return None
        }
        import LogicalTypeAnnotation.TimeUnit._
        val micros = unit match {
          case MILLIS => try Some(math.multiplyExact(raw, 1000L))
            catch { case _: ArithmeticException => None }
          case MICROS => Some(raw)
          case NANOS => Some(java.lang.Math.floorDiv(raw, 1000L))
        }
        micros.map(_.toString)
      case ("d", s: FloatStatistics) =>
        val v = (if (isMin) s.getMin else s.getMax).toDouble + 0.0
        if (v.isNaN) None else Some(v.toString)
      case ("d", s: DoubleStatistics) =>
        val v = (if (isMin) s.getMin else s.getMax) + 0.0
        if (v.isNaN) None else Some(v.toString)
      case ("s", s: BinaryStatistics) =>
        val b = if (isMin) s.genericGetMin else s.genericGetMax
        Some(new String(b.getBytes, StandardCharsets.UTF_8))
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // Sidecar serialization (line-oriented, URL-encoded tokens)
  // ------------------------------------------------------------------

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  def render(entries: Seq[FileEntry]): String = {
    val sb = new StringBuilder(FormatHeader).append('\n')
    entries.sortBy(_.rel).foreach { e =>
      sb.append("F ").append(enc(e.rel)).append(' ')
        .append(e.rows).append('\n')
      e.cols.toSeq.sortBy(_._1).foreach { case (n, st) =>
        sb.append("C ").append(enc(n)).append(' ').append(st.kind)
          .append(' ').append(if (st.hasValues) enc(st.min) else "-")
          .append(' ').append(if (st.hasValues) enc(st.max) else "-")
          .append(' ').append(st.nulls)
          .append(' ').append(if (st.hasValues) "1" else "0")
          .append('\n')
      }
    }
    sb.toString
  }

  /** None = missing/unknown-version/corrupt sidecar (no skipping). */
  def parse(content: String): Option[Seq[FileEntry]] = {
    val lines = content.linesIterator.toList
    if (!lines.headOption.contains(FormatHeader)) return None
    try {
      val out = scala.collection.mutable.ListBuffer.empty[FileEntry]
      var cur: FileEntry = null
      def flush(): Unit = if (cur != null) { out += cur; cur = null }
      lines.tail.foreach { l =>
        if (l.startsWith("F ")) {
          flush()
          val Array(rel, rows) = l.drop(2).split(' ')
          cur = FileEntry(dec(rel), rows.toLong, Map.empty)
        } else if (l.startsWith("C ") && cur != null) {
          val Array(n, kind, mn, mx, nulls, hv) = l.drop(2).split(' ')
          if (Kinds(kind)) {
            val hasValues = hv == "1"
            cur = cur.copy(cols = cur.cols + (dec(n) -> ColStats(kind,
              if (hasValues) dec(mn) else "",
              if (hasValues) dec(mx) else "",
              nulls.toLong, hasValues)))
          }
        } else if (l.nonEmpty && !l.startsWith("#")) throw
          new IllegalArgumentException(s"unparsable stats line: $l")
      }
      flush()
      Some(out.toList)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def write(statsPath: Path, tmpPath: Path, entries: Seq[FileEntry]): Unit = {
    Files.write(tmpPath, render(entries).getBytes(StandardCharsets.UTF_8))
    Files.move(tmpPath, statsPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def read(statsPath: Path): Option[Seq[FileEntry]] =
    try {
      if (!Files.exists(statsPath)) None
      else parse(new String(Files.readAllBytes(statsPath),
        StandardCharsets.UTF_8))
    } catch { case _: java.io.IOException => None }

  // ------------------------------------------------------------------
  // Pruning (scan time: pushed V1 filters vs recorded ranges)
  // ------------------------------------------------------------------

  /** True iff `entry` PROVABLY matches no row of `filter` — the file
    * can be skipped without reading even its footer. Conservative in
    * every unknown: unrecorded column, kind/literal domain mismatch,
    * untranslatable node all answer false (scan it).
    * `logicalToPhysical` maps renamed columns' predicate names to the
    * PHYSICAL file columns the sidecar recorded (column mapping). */
  def canSkip(entry: FileEntry, filter: Filter,
      logicalToPhysical: Map[String, String] = Map.empty): Boolean = {
    def st(a: String): Option[ColStats] =
      entry.cols.get(logicalToPhysical.getOrElse(a, a))
    // all-null column: any value comparison is NULL => filter false
    def allNull(a: String): Boolean = st(a).exists(!_.hasValues)
    // sign of (bound - literal), None when domains don't line up
    def cmpMin(a: String, v: Any): Option[Int] =
      st(a).filter(_.hasValues).flatMap(s => compareTok(s.kind, s.min, v))
    def cmpMax(a: String, v: Any): Option[Int] =
      st(a).filter(_.hasValues).flatMap(s => compareTok(s.kind, s.max, v))
    def eqSkip(a: String, v: Any): Boolean =
      if (v == null) true // `c = NULL` matches nothing
      else allNull(a) ||
        cmpMin(a, v).exists(_ > 0) || cmpMax(a, v).exists(_ < 0)
    filter match {
      case And(l, r) => canSkip(entry, l, logicalToPhysical) ||
        canSkip(entry, r, logicalToPhysical)
      case Or(l, r) => canSkip(entry, l, logicalToPhysical) &&
        canSkip(entry, r, logicalToPhysical)
      case EqualTo(a, v) => eqSkip(a, v)
      case EqualNullSafe(a, null) => st(a).exists(_.nulls == 0L)
      case EqualNullSafe(a, v) => eqSkip(a, v)
      case In(a, vs) =>
        val nn = vs.filter(_ != null)
        // IN (all NULLs) matches nothing; else every value must miss
        nn.forall(v => eqSkip(a, v))
      case GreaterThan(a, v) =>
        v != null && (allNull(a) || cmpMax(a, v).exists(_ <= 0))
      case GreaterThanOrEqual(a, v) =>
        v != null && (allNull(a) || cmpMax(a, v).exists(_ < 0))
      case LessThan(a, v) =>
        v != null && (allNull(a) || cmpMin(a, v).exists(_ >= 0))
      case LessThanOrEqual(a, v) =>
        v != null && (allNull(a) || cmpMin(a, v).exists(_ > 0))
      case IsNull(a) => st(a).exists(_.nulls == 0L)
      case IsNotNull(a) =>
        st(a).exists(s => !s.hasValues && s.nulls == entry.rows)
      case StringStartsWith(a, p) if p != null =>
        // every string with prefix p sorts >= p: max < p excludes all
        allNull(a) || st(a).exists(s => s.kind == "s" && s.hasValues &&
          utf8Cmp(s.max, p) < 0)
      case Not(EqualTo(a, v)) if v != null =>
        // skippable only when EVERY row equals v (min == max == v, no
        // nulls — a NULL row makes `c != v` NULL, which also filters
        // out, so nulls could stay; keep the simple exact form)
        cmpMin(a, v).contains(0) && cmpMax(a, v).contains(0) &&
          st(a).exists(_.nulls == 0L)
      case _ => false
    }
  }

  /** Compare a rendered bound token against an EXTERNAL-typed pushed
    * literal, strictly gated per domain: any mismatch → None. */
  private def compareTok(kind: String, tok: String, v: Any): Option[Int] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    kind match {
      case "l" => (v match {
        case x: java.lang.Long => Some(x.longValue)
        case x: java.lang.Integer => Some(x.longValue)
        case x: java.lang.Short => Some(x.longValue)
        case x: java.lang.Byte => Some(x.longValue)
        case _ => None
      }).map(l => java.lang.Long.compare(tok.toLong, l))
      case "d" => (v match {
        case x: java.lang.Double if !x.isNaN => Some(x.doubleValue + 0.0)
        case x: java.lang.Float if !x.isNaN => Some(x.doubleValue + 0.0)
        case _ => None
      }).map(d => java.lang.Double.compare(tok.toDouble + 0.0, d))
      case "s" => v match {
        case x: String => Some(utf8Cmp(tok, x))
        case _ => None
      }
      case "t" => (v match {
        case x: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(x))
        case x: java.time.Instant => Some(DateTimeUtils.instantToMicros(x))
        case _ => None
      }).map(t => java.lang.Long.compare(tok.toLong, t))
      case "dt" => (v match {
        case x: java.sql.Date => Some(DateTimeUtils.fromJavaDate(x).toLong)
        case x: java.time.LocalDate =>
          Some(DateTimeUtils.localDateToDays(x).toLong)
        case _ => None
      }).map(d => java.lang.Long.compare(tok.toLong, d))
      case _ => None
    }
  }

  private def compareTokens(kind: String, a: String, b: String): Int =
    kind match {
      case "l" | "t" | "dt" => java.lang.Long.compare(a.toLong, b.toLong)
      case "d" => java.lang.Double.compare(a.toDouble + 0.0, b.toDouble + 0.0)
      case "s" => utf8Cmp(a, b)
      case k => throw new IllegalArgumentException(s"unknown kind $k")
    }

  /** UTF-8 binary order — parquet's unsigned byte comparator and
    * Spark's [[UTF8String]] ordering, NOT `String.compareTo`. */
  private def utf8Cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
}
