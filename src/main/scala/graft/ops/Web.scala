package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the stage web pipelines run
  * BEFORE any text-level pass (C4 deduplicates by URL; RefinedWeb
  * applies URL and domain blocklists ahead of extraction): a crawl
  * sees the same page under many surface forms (scheme/host case,
  * `www.`, default ports, tracking parameters, fragments, trailing
  * slashes), and canonicalizing them collapses re-crawls for a cents-
  * per-byte exact dedup on an 8-byte-hashable key instead of a
  * body-sized one. (The reference has no URL surface at all —
  * `/root/reference/src/main/scala/com/github/fvictorio/nnd/NND.scala`
  * is vectors-only; north-star pipeline surface.)
  *
  * Everything here is a pure per-row regex/string projection — zero
  * exchanges, zero UDFs, codegen'd end to end; patterns live in the
  * Java-regex/RE2 common subset (no lookaround, no backreference
  * matching) so the DuckDB twins apply the identical transformation.
  */
object Web {

  /** Canonicalize an absolute http(s) URL column. Adds:
    *  - `norm_url`: scheme and host lowercased; `www.` and the
    *    scheme's default port (`:80` http, `:443` https) dropped;
    *    fragment dropped; tracking parameters (`stripParams`,
    *    default `utm_*`/`fbclid`/`gclid`, matched CASE-INSENSITIVELY —
    *    real crawls carry `UTM_SOURCE=` next to a host that IS being
    *    lowercased) removed with separator repair (`&&` runs
    *    collapse, `?&` heals, trailing `?`/`&` strip); trailing
    *    slashes on the path dropped (root included:
    *    `https://a.com/` = `https://a.com`). Path and surviving query
    *    keep their case — they are case-sensitive per RFC 3986.
    *  - `domain`: the canonical host, the key for domain-level gates
    *    ([[domainGate]]) and per-domain stats.
    *
    * Rows that do not parse as `scheme://...` pass through as
    * `lower(trim(url))` with an empty domain — a crawl manifest
    * carries garbage rows, and a normalizer that errors on them (or
    * silently nulls) poisons the downstream dedup key either way.
    * NULL urls normalize to the empty string (the extractMainContent
    * null-payload convention).
    *
    * `stripParams` entries are REGEX FRAGMENTS (so `utm_[a-z0-9_]*`
    * covers the whole family); each is wrapped `(?:...)` before
    * joining the alternation, so a fragment containing `|` or a
    * capturing group cannot shift the `$1` separator backreference or
    * widen the alternation past its own entry. */
  def normalizeUrls(df: DataFrame, urlCol: String = "url",
      stripParams: Seq[String] = Seq("utm_[a-z0-9_]*", "fbclid", "gclid"))
      : DataFrame = {
    require(stripParams.nonEmpty, "empty stripParams; pass a dummy " +
      "never-matching pattern to keep all parameters")
    val u = trim(coalesce(col(urlCol), lit("")))
    val schemePat = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
    val scheme = lower(regexp_extract(u, schemePat, 1))
    val hostport = lower(regexp_extract(u, schemePat + "([^/?#]*)", 2))
    val hostNoPort = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    // Everything after authority, fragment dropped ([^#]* stops at it).
    val rest = regexp_extract(u, schemePat + "[^/?#]*([^#]*)", 2)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query0 = regexp_extract(rest, "^[^?]*(.*)$", 1)
    // Tracking-parameter strip with separator repair: each removed
    // `?p=v`/`&p=v` leaves its lead separator, so `&&` runs collapse,
    // a `?&` heals to `?`, and a trailing `?`/`&` run strips.
    val q1 = regexp_replace(query0,
      s"([?&])(?i:${stripParams.map(p => s"(?:$p)").mkString("|")})=[^&]*",
      "$1")
    val q = regexp_replace(
      replace(regexp_replace(q1, "&&+", "&"), lit("?&"), lit("?")),
      "[?&]+$", "")
    df.withColumn("norm_url",
        when(scheme === "", lower(u))
          .otherwise(concat(scheme, lit("://"), host, path, q)))
      // The domain key is always port-free: a gate must catch
      // bad.example.com:8080 with the same entry as bad.example.com
      // (norm_url keeps a NON-default port — it distinguishes pages).
      .withColumn("domain", when(scheme === "", lit(""))
        .otherwise(regexp_replace(host, ":[0-9]+$", "")))
  }

  /** Domain blocklist gate (the t33 blocklist shape one level up the
    * stack — RefinedWeb/C4 drop whole domains before reading a byte
    * of their text): `kept = 0` for rows whose `domainCol` is in the
    * curated list. The list is a literal array folded into a
    * codegen'd projection (curated blocklists are thousands of
    * entries — driver-literal scale; a list big enough to need a
    * table becomes a broadcast anti-join with identical semantics). */
  def domainGate(df: DataFrame, blocked: Seq[String],
      domainCol: String = "domain"): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val bl = array(blocked.distinct.sorted.map(lit): _*)
    df.withColumn("kept",
      when(array_contains(bl, col(domainCol)), lit(0L)).otherwise(lit(1L)))
  }
}
