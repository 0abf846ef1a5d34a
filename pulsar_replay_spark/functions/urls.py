"""URL canonicalization — the crawl pipeline's FIRST dedup key.

Crawlers see the same page under dozens of spellings (scheme/host case,
default ports, fragments, tracking parameters, shuffled query order);
canonicalizing before CONTENT dedup removes the bulk of exact re-fetches
for the cost of a map-side expression, and gives every downstream join a
stable per-page key. ``canonical_url`` is pure Catalyst (string splits +
higher-order array ops — no Python in the hot path, valid on batch and
streaming frames alike); ``canonical_url_py`` is the bit-equal python twin
the property tests pin (the ``host_expr``/``_host_of`` discipline).

Normalizations applied (deliberately conservative — nothing that can
change which RESOURCE is addressed):
- scheme and host lowercased; userinfo kept; trailing host dots stripped;
- default ports removed (http:80, https:443);
- fragment dropped (never sent to the server);
- tracking parameters removed (utm_*, gclid, fbclid, msclkid, mc_eid,
  igshid, ref_src) — the industry stoplist, names only ever ADDED here;
- remaining query parameters sorted lexicographically (order is almost
  never significant; sorting collapses permuted re-crawls), empty query
  dropped;
- empty path becomes "/".

Reference analog: none — north-star extension (crawl-curation tier).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref_src")


def canonical_url(url) -> Column:
    """Canonical form of an absolute http(s) URL column; NULL for anything
    that does not parse as one (relative links, mailto, junk) — callers
    coalesce to the raw value when passthrough is wanted."""
    # explicit ASCII whitespace class (= Java \s) on BOTH twins: python's
    # \s also eats unicode whitespace (NBSP, U+2028) the JVM would keep —
    # and \A/\z anchors, not ^/$: Java's $ matches before a final line
    # TERMINATOR (U+2028 included), which would strip whitespace from the
    # middle of a host
    u = F.regexp_replace(url, r"\A[ \t\n\r\x0b\f]+|[ \t\n\r\x0b\f]+\z", "")
    scheme = F.lower(F.regexp_extract(u, r"^(?i:(https?))://", 1))
    rest = F.substr(u, F.instr(u, "://") + F.lit(3))
    # fragment off first (never server-visible), then split query
    no_frag = F.substring_index(rest, "#", 1)
    hostpath = F.substring_index(no_frag, "?", 1)
    query = F.when(
        F.instr(no_frag, "?") > 0,
        F.substr(no_frag, F.instr(no_frag, "?") + F.lit(1)),
    ).otherwise(F.lit(""))
    # authority = up to the first '/', path = the remainder ('' → '/')
    authority = F.substring_index(hostpath, "/", 1)
    path = F.when(
        F.instr(hostpath, "/") > 0,
        F.substr(hostpath, F.instr(hostpath, "/")),
    ).otherwise(F.lit("/"))
    # authority → (userinfo@)? host (:port)?  — host lowercased, trailing
    # dots stripped, default port removed. (IPv6 bracket hosts are out of
    # scope: crawl URLs address named hosts.)
    # ((?:[^@]*@)+) not (.*@): negated classes cross \r/\n identically in
    # BOTH engines, while Java's . excludes \r (python's only \n)
    userinfo = F.regexp_extract(authority, r"^((?:[^@]*@)+)", 1)
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    host = F.lower(
        F.regexp_replace(F.substring_index(hostport, ":", 1), r"\.+\z", "")
    )
    port = F.when(
        F.instr(hostport, ":") > 0, F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    # query: drop tracking params, sort the survivors
    tracked = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~_is_tracking(F.lower(F.substring_index(p, "=", 1))),
    )
    q_sorted = F.array_join(F.array_sort(tracked), "&")
    q_part = F.when(q_sorted == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), q_sorted)
    )
    out = F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path, q_part
    )
    return F.when((scheme != "") & (host != ""), out)


def _is_tracking(name: Column) -> Column:
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | name.startswith(pref)
    for p in TRACKING_PARAMS:
        cond = cond | (name == p)
    return cond


def canonical_url_py(url: str) -> str | None:
    """Bit-equal python twin of ``canonical_url`` (property-gated)."""
    u = re.sub(r"\A[ \t\n\r\x0b\f]+|[ \t\n\r\x0b\f]+\Z", "", url)
    m = re.match(r"^(?i:(https?))://", u)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = u[u.index("://") + 3 :]
    no_frag = rest.split("#", 1)[0]
    if "?" in no_frag:
        hostpath, query = no_frag.split("?", 1)
    else:
        hostpath, query = no_frag, ""
    if "/" in hostpath:
        i = hostpath.index("/")
        authority, path = hostpath[:i], hostpath[i:]
    else:
        authority, path = hostpath, "/"
    am = re.match(r"^((?:[^@]*@)+)", authority)
    userinfo = am.group(1) if am else ""
    hostport = re.search(r"([^@]*)$", authority).group(1)
    host = re.sub(r"\.+\Z", "", hostport.split(":", 1)[0]).lower()
    port = hostport.rsplit(":", 1)[1] if ":" in hostport else ""
    if (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
        or port == ""
    ):
        port_part = ""
    else:
        port_part = ":" + port
    parts = [
        p
        for p in query.split("&")
        if p != ""
        and not _is_tracking_py(p.split("=", 1)[0].lower())
    ]
    q_sorted = "&".join(sorted(parts))
    q_part = "?" + q_sorted if q_sorted else ""
    if scheme == "" or host == "":
        return None
    return f"{scheme}://{userinfo}{host}{port_part}{path}{q_part}"


def _is_tracking_py(name: str) -> bool:
    return name.startswith(TRACKING_PREFIXES) or name in TRACKING_PARAMS


def url_dedup_marks(docs: DataFrame, url_col: str = "source") -> DataFrame:
    """(doc_id, canonical_url, keep): URL-level exact dedup — keep the
    min-doc_id row per canonical URL; rows whose ``url_col`` doesn't parse
    as an absolute http(s) URL keep unconditionally (no URL ≠ duplicate).
    One shuffle on the canonical-url key (map-side combined); run BEFORE
    content dedup to shed re-fetches without touching text."""
    keyed = docs.select(
        "doc_id", canonical_url(F.col(url_col)).alias("canonical_url")
    )
    winners = (
        keyed.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    return keyed.join(winners, "canonical_url", "left").select(
        "doc_id",
        "canonical_url",
        (
            F.col("canonical_url").isNull() | (F.col("doc_id") == F.col("_keep_id"))
        ).alias("keep"),
    )
