package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines (the C4/CommonCrawl
  * "same page, different URL spelling" dedup key): lowercase scheme and
  * host, strip default ports (:80/:443) and fragments, sort query
  * parameters, empty path -> "/". Plus registered-domain extraction for
  * per-domain quotas/blocklists.
  *
  * All map-only column compositions; every regex is in the Java-regex ∩
  * RE2 common subset (the PiiRedaction rule), so the DuckDB oracle runs
  * the identical patterns.
  */
object UrlFunctions {

  /** scheme://host[:port][/path][?query][#fragment] splitter — groups:
    * 1 scheme, 2 host[:port], 3 path, 4 query. */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Canonical form of an absolute URL; non-URLs (no match) yield the
    * canonicalization of empty parts, i.e. "://" — filter upstream or
    * test with isUrl. */
  def normalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, UrlRe, 1))
    val host = regexp_replace(lower(regexp_extract(u, UrlRe, 2)),
      ":(443|80)$", "")
    val rawPath = regexp_extract(u, UrlRe, 3)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val q = regexp_extract(u, UrlRe, 4)
    val query = when(q === "", lit(""))
      .otherwise(concat(lit("?"),
        array_join(array_sort(filter(split(q, "&"), x => x =!= "")), "&")))
    concat(scheme, lit("://"), host, path, query)
  }

  /** Registered domain-ish: the last two dot-labels of the (normalized)
    * host — the per-site aggregation key. (A full public-suffix list is
    * a data file, not an algorithm; two labels is the standard
    * approximation when the list isn't shipped.) */
  def registeredDomain(u: Column): Column =
    regexp_extract(
      regexp_replace(lower(regexp_extract(u, UrlRe, 2)), ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)

  def isUrl(u: Column): Column = u.rlike(UrlRe)
}
