package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** L2k/L4m — URL handling for web-corpus curation: canonical dedup keys
  * and registered-domain extraction (the C4/RefinedWeb-style gates that
  * run before any text is read — domain allow/deny lists, per-domain
  * caps, URL-level dedup of recrawls).
  *
  * All map-only over `try_parse_url` (a codegen'd built-in that NULLs malformed rows) + regexes —
  * canonicalization runs at scan speed and the canonical key feeds the
  * ordinary exact-dedup path (groupBy on the key). */
object UrlFunctions {

  /** Lowercased host (URL authority). NULL for malformed input —
    * malformed rows form their own NULL group downstream rather than
    * throwing mid-scan. */
  def urlHost(u: Column): Column = lower(try_parse_url(u, lit("HOST")))

  /** Registered domain heuristic: the last two dot-labels of the host
    * (site.com from cdn.site.com). A public-suffix list refines this at
    * production quality; the two-label form is the deterministic,
    * dependency-free core. */
  def registeredDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** Canonical dedup key: lowercased host + path with trailing slashes
    * stripped — scheme, query string (tracking params), and fragment
    * dropped. Two recrawls of the same page under ?utm_… variants, case
    * drift, or a trailing slash collapse to one key. */
  def canonicalUrl(u: Column): Column =
    concat(urlHost(u),
      regexp_replace(coalesce(try_parse_url(u, lit("PATH")), lit("")), "/+$", ""))
}
