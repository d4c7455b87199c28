package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl curation — the dedup key problem:
  * the same page arrives as `HTTPS://WWW.Site.COM:443/a?utm_source=x#top`
  * and `https://www.site.com/a`, and a corpus keyed on raw URLs keeps
  * both. Normalization: lowercase scheme+host, strip the default port
  * (:443/:80), drop the fragment, drop tracking params (utm_*, ref),
  * rebuild the path from its non-empty segments.
  *
  * Deliberately built from SPLIT/FILTER/JOIN array ops, not regex — the
  * oracle replays it with DuckDB's list functions, and list semantics
  * align exactly where regex DIALECTS (java.util.regex vs RE2) do not.
  * Splits pass limit −1 so trailing empty fields survive like DuckDB's
  * string_split. All map-side, codegen'd, no UDFs (q_url_normalize).
  */
object UrlFunctions {

  private def noFrag(url: Column): Column =
    element_at(split(url, "#", -1), 1)

  /** Lowercased scheme ("https"). */
  def urlScheme(url: Column): Column =
    lower(element_at(split(noFrag(url), "://", -1), 1))

  private def afterScheme(url: Column): Column =
    element_at(split(noFrag(url), "://", -1), 2)

  private def beforeQuery(url: Column): Column =
    element_at(split(afterScheme(url), "\\?", -1), 1)

  /** Lowercased host with the SCHEME'S default port stripped (https:443,
    * http:80); any other port survives — https://x:80 is a genuinely
    * different origin from https://x and must not merge with it. */
  def urlHost(url: Column): Column = {
    val hp = lower(element_at(split(beforeQuery(url), "/", -1), 1))
    val scheme = urlScheme(url)
    when((scheme === "https" && hp.endsWith(":443")) ||
         (scheme === "http" && hp.endsWith(":80")),
      element_at(split(hp, ":", -1), 1)).otherwise(hp)
  }

  /** Non-empty path segments. */
  def urlPathSegments(url: Column): Column = {
    val parts = split(beforeQuery(url), "/", -1)
    filter(slice(parts, lit(2), size(parts)), s => s =!= "")
  }

  def urlPathDepth(url: Column): Column = size(urlPathSegments(url))

  /** Query params with tracking noise (utm_*, ref=) removed, original
    * order preserved. */
  def urlCleanParams(url: Column): Column = {
    val qparts = split(afterScheme(url), "\\?", -1)
    val params = when(size(qparts) > 1,
      filter(split(element_at(qparts, 2), "&", -1), p => p =!= ""))
      .otherwise(array().cast("array<string>"))
    filter(params,
      p => !p.startsWith("utm_") && !p.startsWith("ref="))
  }

  /** The canonical URL: lowercased scheme+host, default port and
    * fragment gone, tracking params gone, path rebuilt from non-empty
    * segments (no trailing slash). */
  def normalizeUrl(url: Column): Column = {
    val kept = urlCleanParams(url)
    concat(
      urlScheme(url), lit("://"), urlHost(url),
      when(size(urlPathSegments(url)) > 0,
        concat(lit("/"), array_join(urlPathSegments(url), "/")))
        .otherwise(lit("")),
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }
}
