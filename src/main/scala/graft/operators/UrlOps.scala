package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup-key normalization every web-corpus
  * pipeline runs before URL-level dedup / host-level mixing (the same
  * rule family documented for crawl dedup in public pipelines:
  * lowercase scheme+host, strip default ports and `www.`, collapse
  * path slashes, drop fragments and tracking parameters, sort the
  * surviving query params so param order is not identity).
  *
  * Pure `Column` expressions end to end — regexp extraction plus
  * higher-order array ops, no UDF — so the whole normalization stays
  * inside whole-stage codegen and pushes through Catalyst like any
  * built-in. At 100 TB this is a narrow map over the URL column; the
  * only shuffle in a typical use is the downstream groupBy(url_norm).
  *
  * Normalization rules (applied in order; each is mirrored verbatim
  * by the q153 oracle SQL):
  *   1. trim surrounding whitespace;
  *   2. scheme → lowercase;
  *   3. host (authority up to `:`) → lowercase, leading `www.`
  *      stripped;
  *   4. port dropped when it is the scheme default (http:80,
  *      https:443), kept otherwise;
  *   5. path: runs of `/` collapse to one, trailing slashes strip
  *      (root path normalizes to the empty path);
  *   6. fragment dropped;
  *   7. query params: empties and tracking params
  *      (`utm_*`, `fbclid`, `gclid`, `ref`) dropped, the rest sorted
  *      byte-lexicographically and rejoined with `&`.
  */
object UrlOps {

  private val TrackingParam = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)(=|$)"

  /** Lowercased scheme of a URL literal ("" when absent). */
  def scheme(url: Column): Column =
    lower(regexp_extract(trim(url), "^([^:/?#]+)://", 1))

  /** Lowercased host without `www.` or port. */
  def host(url: Column): Column = {
    val authority =
      regexp_extract(trim(url), "^[^:/?#]+://([^/?#]*)", 1)
    regexp_replace(
      regexp_replace(lower(authority), ":\\d*$", ""), "^www\\.", "")
  }

  /** Canonical normalized URL per the rule list above. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val sch = scheme(url)
    val h = host(url)
    val port = regexp_extract(lower(
      regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1)), ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(sch === "http" && port === "80") &&
      !(sch === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val rawPath = regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val path = regexp_replace(
      regexp_replace(rawPath, "/{2,}", "/"), "/+$", "")
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val params = filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&")))
      .otherwise(lit(""))
    // not a parseable absolute URL (no scheme or no host) → null,
    // not a junk "://"-prefixed string — callers groupBy(url_norm)
    // and a junk non-null key would silently cluster all malformed
    // rows together
    when(sch === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, path, queryPart))
  }
}
