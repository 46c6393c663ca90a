package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the FIRST dedup stage of a
  * web-corpus pipeline (C4/CCNet drop refetched pages by canonical URL
  * before any content hashing), composing directly with the WARC reader's
  * `target_uri`. Same cross-engine discipline as
  * [[TextAnalysis.htmlToText]]: every regex has identical Java/RE2
  * semantics (anchors, ASCII character classes, alternation — no
  * backreferences, no `\s`, no lazy-vs-greedy edge), both engines'
  * replaces run GLOBAL, `lower()` is the ASCII fold both share on these
  * characters, so the t15 oracle recomputes the chain hash-exactly. */
object UrlOps {

  /** Canonical form:
    *   - fragment dropped;
    *   - scheme and host lowercased; a leading `www.` dropped; a
    *     protocol-relative `//host/...` parses its authority like a
    *     schemed URL (prefix preserved); userinfo (`user@`) is split off
    *     the authority first and kept VERBATIM — it is case-sensitive per
    *     RFC 3986 and must neither fold nor block the `www.` strip;
    *   - the scheme's default port dropped (`:80` for http, `:443` for
    *     https — a NON-default or wrong-scheme port is kept);
    *   - query handling splits at the FIRST `?` so repairs never touch
    *     `?`/`/?` sequences inside query VALUES: tracking parameters
    *     (`utm_*`, `fbclid`, `gclid`) are removed with the separator
    *     repaired, and an emptied query drops its `?`;
    *   - a single trailing `/` on the path dropped (so `/a/` ≡ `/a`,
    *     `/a/?q` ≡ `/a?q`, and a bare host ends without a slash).
    * This is a columnar normalizer, not a validator — a malformed URL
    * normalizes best-effort instead of failing (curation drops
    * unfetchable URLs elsewhere). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // protocol-relative: authority parsing must not see the bare "//"
    val protoRel = scheme === "" && rest.startsWith("//")
    val body = when(protoRel, regexp_replace(rest, "^//", "")).otherwise(rest)
    val authority = regexp_extract(body, "^([^/?]*)", 1)
    val userinfo = regexp_extract(authority, "^([^/?@]*@)", 1) // "" or verbatim "user@"
    val hostPort = lower(regexp_replace(authority, "^[^/?@]*@", ""))
    // a trailing FQDN dot ("example.com." — DNS root-dot form crawlers
    // do emit) folds to the dotless host, before OR after a port
    val host0 = regexp_replace(
      regexp_replace(hostPort, "^www\\.", ""), "\\.(:[0-9]+)?$", "$1")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val afterAuth = regexp_replace(body, "^[^/?]*", "")
    // split at the FIRST "?": repairs stay out of query values, which may
    // legally contain "?" themselves
    val pathPart = regexp_extract(afterAuth, "^([^?]*)", 1)
    val queryPart = regexp_replace(afterAuth, "^[^?]*", "")
    val trackers = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"
    val q1 = regexp_replace(queryPart, s"&$trackers=[^&#]*", "")
    val q2 = regexp_replace(q1, s"^\\?$trackers=[^&#]*&?", "?")
    val query = regexp_replace(q2, "^\\?$", "")
    val path = regexp_replace(pathPart, "/$", "")
    val tail = concat(host, path, query)
    when(scheme === "",
        concat(when(protoRel, lit("//")).otherwise(lit("")), userinfo, tail))
      .otherwise(concat(scheme, lit("://"), userinfo, tail))
  }

  /** URL-level dedup: one row per canonical URL, the shared d1 keeper
    * convention ([[graft.dedup.Dedup.keepersBy]] — keeper = min id,
    * `n_dups` = group size; one map-side-combinable aggregation). Rows
    * with a NULL url or one that canonicalizes to EMPTY are excluded —
    * WARC warcinfo/metadata records carry no `WARC-Target-URI`, and
    * grouping them would mark unrelated URL-less documents as duplicates
    * of each other. At 100 TB this is the cheapest dedup stage by
    * construction (no shingles, no content reads). Returns
    * `(url_canon, keeper, n_dups)`. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    graft.dedup.Dedup.keepersBy(
      df.filter(col(urlCol).isNotNull)
        .select(col(idCol), canonicalizeUrl(col(urlCol)).as("__uc"))
        .filter(col("__uc") =!= ""),
      idCol, col("__uc"), "url_canon")
}
