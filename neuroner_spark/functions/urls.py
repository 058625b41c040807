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
    """Lowercased host, ``www.`` and any ``:port`` stripped (a port
    would corrupt the label slicing in ``url_domain``: bbc.co.uk:8080
    must parse like bbc.co.uk, not like a host ending in 'uk:8080').

    The ``www.`` strip is CONDITIONAL on the host not being a PSL
    exception rule itself: ``www.ck`` (the ``!www.ck`` rule) is a
    registrable domain whose first label happens to be 'www', so
    stripping it would turn a registrable host into the bare wildcard
    TLD and ``url_domain``'s exception branch could never fire."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")
    return _strip_www(host)


def _strip_www(host: Column) -> Column:
    """Strip a leading ``www.`` UNLESS the (port-stripped) host is a
    PSL exception rule (``!www.ck``) — shared by ``url_host`` and
    ``canonical_url`` so the dedup key and the domain parser agree on
    which hosts keep their 'www' label."""
    bare = F.regexp_replace(host, r":\d+$", "")
    return F.when(bare.isin(TLD_EXCEPTIONS), host).otherwise(
        F.regexp_replace(host, r"^www\.", "")
    )


# Trimmed snapshot of the Mozilla Public Suffix List (public data,
# publicsuffix.org): the two-label public suffixes covering the major
# ccTLD second-level registries seen in web crawls. Hosts under one of
# these register at the THIRD label (bbc.co.uk), not the second.
_PSL_2LD = {
    "uk": ["ac", "co", "gov", "ltd", "me", "mod", "net", "nhs", "org", "plc", "police", "sch"],
    "au": ["asn", "com", "edu", "gov", "id", "net", "org"],
    "nz": ["ac", "co", "geek", "gen", "govt", "kiwi", "maori", "net", "org", "school"],
    "za": ["ac", "co", "edu", "gov", "law", "mil", "net", "org", "school", "web"],
    "br": ["adv", "art", "blog", "com", "edu", "eco", "gov", "ind", "inf", "mil", "net", "org", "tv", "wiki"],
    "jp": ["ac", "ad", "co", "ed", "go", "gr", "lg", "ne", "or"],
    "kr": ["ac", "co", "es", "go", "hs", "kg", "mil", "ms", "ne", "or", "pe", "re", "sc"],
    "in": ["ac", "co", "edu", "firm", "gen", "gov", "ind", "mil", "net", "nic", "org", "res"],
    "cn": ["ac", "com", "edu", "gov", "mil", "net", "org"],
    "tw": ["club", "com", "ebiz", "edu", "game", "gov", "idv", "mil", "net", "org"],
    "hk": ["com", "edu", "gov", "idv", "net", "org"],
    "sg": ["com", "edu", "gov", "net", "org", "per"],
    "mx": ["com", "edu", "gob", "net", "org"],
    "ar": ["com", "edu", "gob", "gov", "int", "mil", "net", "org", "tur"],
    "tr": ["av", "bbs", "bel", "biz", "com", "dr", "edu", "gen", "gov", "info", "k12", "mil", "name", "net", "org", "pol", "tv", "web"],
    "il": ["ac", "co", "gov", "idf", "k12", "muni", "net", "org"],
    "ua": ["com", "edu", "gov", "in", "net", "org"],
    "th": ["ac", "co", "go", "in", "mi", "net", "or"],
    "id": ["ac", "biz", "co", "desa", "go", "mil", "my", "net", "or", "sch", "web"],
    "my": ["com", "edu", "gov", "mil", "name", "net", "org"],
    "ph": ["com", "edu", "gov", "mil", "net", "ngo", "org"],
    "vn": ["ac", "biz", "com", "edu", "gov", "health", "info", "int", "name", "net", "org", "pro"],
    "pl": ["biz", "com", "edu", "gov", "info", "mil", "net", "org", "waw"],
    "ng": ["com", "edu", "gov", "mil", "mobi", "name", "net", "org", "sch"],
    "ke": ["ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"],
    "eg": ["com", "edu", "eun", "gov", "mil", "name", "net", "org", "sci"],
    "sa": ["com", "edu", "gov", "med", "net", "org", "pub", "sch"],
    "ae": ["ac", "co", "gov", "mil", "net", "org", "sch"],
    "pk": ["biz", "com", "edu", "fam", "gob", "gov", "net", "org", "web"],
    "bd": ["ac", "com", "edu", "gov", "mil", "net", "org"],
    "lk": ["ac", "com", "edu", "gov", "int", "net", "org", "sch"],
    "np": ["com", "edu", "gov", "mil", "net", "org"],
    "ir": ["ac", "co", "gov", "id", "net", "org", "sch"],
    "ru": ["com", "net", "org", "pp"],
    "rs": ["ac", "co", "edu", "gov", "in", "org"],
    "gr": ["com", "edu", "gov", "net", "org"],
    "cy": ["ac", "biz", "com", "gov", "ltd", "net", "org", "press", "pro", "tm"],
}
TWO_LABEL_SUFFIXES = sorted(
    f"{sld}.{tld}" for tld, slds in _PSL_2LD.items() for sld in slds
)

# PSL wildcard rules. ``*.<tld>`` TLDs: EVERY second-level name is a
# public suffix (registries that delegate all of level 2), so the
# registrable domain is the third label — except the listed exception
# rules (``!www.ck``), which are themselves registrable.
WILDCARD_TLDS = sorted(["bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg"])
TLD_EXCEPTIONS = ["www.ck"]
# ``*.<city>.jp`` rules: the JP geographic-type registries where every
# third-level name is a public suffix (shop.example.kawasaki.jp
# registers at the FOURTH label), except ``!city.<city>.jp``.
WILDCARD_2LD = sorted(
    f"{city}.jp"
    for city in [
        "kawasaki",
        "kitakyushu",
        "kobe",
        "nagoya",
        "sapporo",
        "sendai",
        "yokohama",
    ]
)
SUFFIX_EXCEPTIONS = sorted(f"city.{w}" for w in WILDCARD_2LD)


def url_domain(url: Column) -> Column:
    """Registrable domain of the host, public-suffix-aware (PSL
    algorithm, embedded trimmed snapshot of publicsuffix.org):

    - exception rules win (``!www.ck``, ``!city.kawasaki.jp`` are
      registrable themselves);
    - ``*.<city>.jp`` wildcard 2LDs register at the FOURTH label;
    - ``*.<tld>`` wildcard TLDs (``bd ck er fk jm kh mm np pg``)
      register at the THIRD label;
    - listed two-label suffixes (``co.uk``, ``com.au``, …) register at
      the THIRD label;
    - everything else: last two labels (heuristic fallback).

    Pure column expressions — the suffix tables compile to Catalyst
    ``IN`` lists over fixed label slices, zero UDFs/shuffles.  A host
    that IS a public suffix ('co.uk', 'foo.kawasaki.jp') has no
    registrable domain and falls through to itself/the two-label
    answer."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    last4 = F.array_join(F.slice(labels, F.greatest(n - 3, F.lit(1)), 4), ".")
    return (
        # exception rules (highest PSL precedence)
        F.when((n >= 3) & last3.isin(SUFFIX_EXCEPTIONS), last3)
        .when((n >= 2) & last2.isin(TLD_EXCEPTIONS), last2)
        # *.city.jp wildcard 2LDs: suffix is 3 labels -> keep 4
        .when((n >= 4) & last2.isin(WILDCARD_2LD), last4)
        .when((n >= 3) & last2.isin(WILDCARD_2LD), last3)  # host == suffix
        # *.tld wildcards: suffix is 2 labels -> keep 3
        .when((n >= 3) & last1.isin(WILDCARD_TLDS), last3)
        # listed two-label suffixes -> keep 3
        .when((n >= 3) & last2.isin(TWO_LABEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


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
    host = _strip_www(F.lower(host_part))
    path_q = F.regexp_replace(tail, r"/(\?|$)", r"$1")  # strip trailing / before query/end
    return F.concat(scheme, F.lit("://"), host, path_q)
