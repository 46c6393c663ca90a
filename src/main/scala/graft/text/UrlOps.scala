package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the FIRST dedup stage of a
  * web-corpus pipeline (C4/CCNet drop refetched pages by canonical URL
  * before any content hashing), composing directly with the WARC reader's
  * `target_uri`. Same cross-engine discipline as
  * [[TextAnalysis.htmlToText]]: every regex has identical Java/RE2
  * semantics (anchors, ASCII character classes, alternation — no
  * backreferences, no `\s`, no lazy-vs-greedy edge), `lower()` is the
  * ASCII fold both engines share on these characters, so the t15 oracle
  * recomputes the chain hash-exactly in DuckDB. */
object UrlOps {

  /** Canonical form:
    *   - fragment dropped;
    *   - scheme and host lowercased; a leading `www.` dropped;
    *   - the scheme's default port dropped (`:80` for http, `:443` for
    *     https — a NON-default port is kept);
    *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`), with
    *     the query separator repaired and an emptied query dropped;
    *   - a single trailing `/` dropped (so `/a/` ≡ `/a`, and a bare host
    *     ends without a slash).
    * Scheme-less inputs pass through the same host/path rules. This is a
    * columnar normalizer, not a validator — a malformed URL normalizes
    * best-effort instead of failing (curation drops unfetchable URLs
    * elsewhere). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(rest, "^[^/?]*", "")
    // tracking removal in two shapes so the "?" survives when later params
    // do: "&param=v" anywhere drops outright; a "?param=v" start re-anchors
    // the next param onto "?" (or becomes a bare "?" when it was the only
    // one). Then strip an emptied "?", a slash left dangling before the
    // query, and a trailing slash (each residual pattern occurs at most
    // once: a URL has one "?").
    val trackers = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"
    val noAmp = regexp_replace(path0, s"&$trackers=[^&#]*", "")
    val noTrack = regexp_replace(noAmp, s"\\?$trackers=[^&#]*&?", "?")
    val repaired = regexp_replace(
      regexp_replace(noTrack, "\\?$", ""), "/\\?", "?")
    val path = regexp_replace(repaired, "/$", "")
    when(scheme === "", concat(host, path))
      .otherwise(concat(scheme, lit("://"), host, path))
  }

  /** URL-level dedup: one row per canonical URL — the keeper is the
    * smallest id (the d1 exact-dedup convention). One map-side-combinable
    * aggregation keyed by canonical URL; at 100 TB this is the cheapest
    * dedup stage by construction (no shingles, no content reads). Returns
    * `(urlCanonCol, keeper, n_dups)`. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy("url_canon")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))
}
