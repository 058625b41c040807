"""URL normalization & decomposition for Common-Crawl-style ingest
(no reference analog — part of the web-scale pipeline surface the
brief requires; pure JVM column expressions, zero UDFs/shuffles).

Canonicalization rules (pinned):
  - scheme and host lowercased; leading ``www.`` stripped from host
  - fragment (``#...``) dropped
  - known tracking query params dropped (utm_*, gclid, fbclid, ref);
    remaining params kept in original order
  - trailing ``/`` stripped from non-root paths
These are the standard dedup-key rules for crawl frontiers: two crawls
of the same page under tracking-param / fragment variants collapse to
one canonical url.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# anchored to a parameter boundary: 'href=...' or '/ref=...' path
# segments must NOT match (unanchored, they would corrupt the key)
_TRACKING = r"(?<=[?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def url_host(url: Column) -> Column:
    """Lowercased host, ``www.`` stripped."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(url: Column) -> Column:
    """Registrable-ish domain: last two labels of the host (heuristic —
    a public-suffix list is the production upgrade, same call site)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_path(url: Column) -> Column:
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    norm = F.regexp_replace(path, r"/$", "")
    return F.when(norm == "", F.lit("/")).otherwise(norm)


def canonical_url(url: Column) -> Column:
    """Tracking-param/fragment-insensitive canonical form (dedup key)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # drop tracking params, then tidy dangling separators — collapse
    # runs of '&' BEFORE fixing '?&' (two stripped leading params leave
    # '?&&x' which must become '?x', not '?&x'), then trailing '?'/'&'
    no_track = F.regexp_replace(no_frag, _TRACKING, "")
    tidy = F.regexp_replace(no_track, r"&&+", "&")
    tidy = F.regexp_replace(tidy, r"\?&", "?")
    tidy = F.regexp_replace(tidy, r"[?&]+$", "")
    scheme = F.lower(F.regexp_extract(tidy, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(tidy, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host_part = F.regexp_extract(rest, r"^([^/?#]+)", 1)
    tail = F.substring(rest, F.length(host_part) + 1, F.lit(1 << 20))
    host = F.regexp_replace(F.lower(host_part), r"^www\.", "")
    path_q = F.regexp_replace(tail, r"/(\?|$)", r"$1")  # strip trailing / before query/end
    return F.concat(scheme, F.lit("://"), host, path_q)
