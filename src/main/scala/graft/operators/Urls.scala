package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-key dedup — the first dedup pass
  * of every web-crawl pipeline: the same page is fetched as
  * `HTTP://Example.com/a/?utm_source=feed#top` and
  * `http://example.com/a`, and URL-level dedup removes the refetch
  * before any content hash is even computed (it is orders of
  * magnitude cheaper than text dedup — pure string ops on a short
  * column, no shingles, no signatures).
  *
  * Canonical form (applied in this order, all regex/string ops):
  *   1. trim surrounding whitespace;
  *   2. drop the `#fragment` (never reaches the server);
  *   3. lowercase the scheme and the host (path and query stay
  *      case-sensitive per RFC 3986 §6.2.2.1);
  *   4. drop a default port (`:80` for http, `:443` for https);
  *   5. drop tracking query params (`utm_*`, `gclid`, `fbclid`,
  *      `msclkid`, `mc_eid`) — order of the SURVIVING params is
  *      preserved (param reordering can be semantic; only known-inert
  *      params are touched), an emptied query drops its `?`;
  *   6. drop trailing `/`s from the path (`/a/` → `/a`, and the root
  *      `/` drops entirely so `host/` ≡ `host` — RFC 3986 §6.2.3's
  *      empty-path equivalence, resolved toward the shorter form).
  *
  * Scale shape: one narrow codegen'd projection (regexp_replace +
  * split/filter/array_join — no UDF), then dedup is the standard
  * min_by first-wins partial aggregate on the canonical key: map-side
  * combine collapses refetches before the shuffle, so shuffle volume
  * is one slim row per DISTINCT canonical URL, not per fetch. Every
  * step is replayable in ANSI-ish SQL (list_filter/list_transform in
  * DuckDB) for the oracle gate.
  */
object Urls {

  private val TrackingParams = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)="

  /** Canonical form of `url` (see object doc for the exact rules).
    * Non-URL strings pass through mostly untouched (no scheme → no
    * host lowercasing), which is the safe behavior for a dirty
    * crawl column. */
  def canonicalize(url: Column): Column = {
    val trimmed = trim(url)
    val noFrag = regexp_replace(trimmed, "#.*$", "")
    // scheme://host[:port] prefix, lowercased; rest untouched
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val hostNoDefault = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    // split rest into path and query
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val keptParams = filter(split(query, "&"),
      p => !(p.rlike(TrackingParams) || p === ""))
    val cleanQuery = array_join(keptParams, "&")
    val cleanPath = regexp_replace(path, "/+$", "")
    val rebuilt = concat(scheme, lit("://"), hostNoDefault, cleanPath,
      when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery)))
    when(scheme === "", noFrag).otherwise(rebuilt)
  }

  /** First-wins dedup by canonical URL: one row per distinct
    * canonical form, keeping the minimum `idCol` (deterministic,
    * partial-agg — the [[Dedup.exactDedup]] shape). Output:
    * (canon_url, `idCol` of the kept row, n_variants). */
  def dedupByCanonical(df: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("canon_url"), col(idCol))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_variants"))
}
