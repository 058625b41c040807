"""Deterministic synthetic fixtures (FIXTURES.md; seed=42 throughout).

Pure functions of the seed — no wall clock, no read-time randomness —
so golden files frozen from them are stable across runs and machines.
These complement (never replace) the driver tables in /root/testdata.

Fixture set:
- ``pages``        input_hint shape: url, warc_ts, html, text, lang
- ``alias_dict``   entity-linking dictionary (J8/J9)
- ``conll_tokens`` gold-tagged token table (derived from pages text)
- ``sameas_edges`` connected-components unit fixture (J10)
"""

from __future__ import annotations

import datetime as dt

import numpy as np

SEED = 42

# ~200 canonical entities: title-cased multi-token names assembled from
# pinned word lists (deterministic under the seed).
_FIRST = [
    "Alder", "Birch", "Cedar", "Dunes", "Ember", "Falcon", "Granite", "Harbor",
    "Iris", "Juniper", "Kestrel", "Lumen", "Meridian", "Nimbus", "Onyx", "Pioneer",
    "Quartz", "Rowan", "Summit", "Tundra",
]
_SECOND = [
    "Analytics", "Systems", "Works", "Labs", "Dynamics", "Partners", "Group",
    "Industries", "Networks", "Holdings",
]
_TYPES = ["PER", "ORG", "LOC", "MISC"]

_FILLER = (
    "the a data table scan join merge sort window filter group agg row column "
    "key value batch stream query plan spark hash part line order small big "
    "fast slow vector dup customer"
).split()


def canonical_entities(n: int = 200) -> list[tuple[int, str, str]]:
    """[(entity_id, canonical_name, type)] — deterministic."""
    rng = np.random.default_rng(SEED)
    out = []
    for eid in range(n):
        first = _FIRST[eid % len(_FIRST)]
        second = _SECOND[(eid // len(_FIRST)) % len(_SECOND)]
        name = f"{first} {second}" if eid < len(_FIRST) * len(_SECOND) else f"{first} {second} {eid}"
        etype = _TYPES[int(rng.integers(0, len(_TYPES)))]
        out.append((eid, name, etype))
    return out


def _norm(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", re.sub(r"\d", "0", s.lower())).strip()


def alias_rows(n_entities: int = 200):
    """alias_dict rows: (alias, alias_norm, entity_id, canonical_name, prior).

    Exact name + lowercase variant + ~10% typo variants (edit distance 1)
    + ~5% ambiguous aliases shared by two entities.
    """
    rng = np.random.default_rng(SEED + 1)
    ents = canonical_entities(n_entities)
    rows = []
    for eid, name, _t in ents:
        rows.append((name, _norm(name), eid, name, 1.0))
        rows.append((name.lower(), _norm(name), eid, name, 1.0))
        if rng.random() < 0.10:  # typo: drop one interior char
            i = int(rng.integers(1, len(name) - 1))
            typo = name[:i] + name[i + 1 :]
            rows.append((typo, _norm(typo), eid, name, 1.0))
    # ambiguous aliases: one shared short alias mapping to 2 entities
    for k in range(0, n_entities, 20):
        a, b = ents[k], ents[(k + 1) % n_entities]
        shared = a[1].split()[0]  # first word only
        rows.append((shared, _norm(shared), a[0], a[1], 0.7))
        rows.append((shared, _norm(shared), b[0], b[1], 0.3))
    # renormalize priors per alias_norm
    from collections import defaultdict

    tot = defaultdict(float)
    for r in rows:
        tot[(r[0], r[1])] = 0.0
    agg = defaultdict(float)
    for r in rows:
        agg[r[1]] += r[4]
    rows = [(al, an, eid, cn, p / agg[an]) for (al, an, eid, cn, p) in rows]
    return rows


def page_rows(n: int = 500):
    """pages rows: (url, warc_ts, html, text, lang).

    Zipf host skew (~50 hosts, s=1.2); text = 1–8 sentences of filler
    words with embedded entity surfaces; ~5% of rows contain unicode
    whitespace to exercise P2.
    """
    rng = np.random.default_rng(SEED + 2)
    ents = canonical_entities()
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    hosts = rng.zipf(1.2, size=n) % 50
    for i in range(n):
        h = int(hosts[i])
        n_sents = int(rng.integers(1, 9))
        sents = []
        for _s in range(n_sents):
            n_words = int(rng.integers(4, 12))
            words = [_FILLER[int(rng.integers(0, len(_FILLER)))] for _ in range(n_words)]
            # embed 0-2 entity mentions per sentence
            for _m in range(int(rng.integers(0, 3))):
                eid = int(rng.zipf(1.3) % len(ents))
                name = ents[eid][1]
                ins = int(rng.integers(0, len(words) + 1))
                words = words[:ins] + [name] + words[ins:]
            end = [". ", "! ", "? "][int(rng.integers(0, 3))]
            sents.append(" ".join(words) + end.strip())
        text = " ".join(sents)
        if rng.random() < 0.05:
            # swap one space for a unicode whitespace (P2 exercise)
            idx = text.find(" ")
            if idx >= 0:
                ws = " " if rng.random() < 0.5 else " "
                text = text[:idx] + ws + text[idx + 1 :]
        url = f"https://host{h}.example/p{i}"
        ts = base + dt.timedelta(seconds=int(rng.integers(0, 30 * 86400)))
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        lang = ["en", "en", "en", "de", "es", "fr", "zh"][int(rng.integers(0, 7))]
        rows.append((url, ts, html, text, lang))
    return rows


def sameas_edge_rows(n_clusters: int = 50, seed_off: int = 3):
    """(src, dst) edges forming K disjoint clusters with chains up to 40
    (worst case for label-propagation round counts), plus the golden
    node->component map computed by a trivial union-find here."""
    rng = np.random.default_rng(SEED + seed_off)
    edges: list[tuple[int, int]] = []
    golden: dict[int, int] = {}
    node = 0
    for c in range(n_clusters):
        size = max(1, min(200, int(rng.zipf(1.5))))
        members = list(range(node, node + size))
        node += size
        if size == 1:
            golden[members[0]] = members[0]
            continue
        if c % 5 == 0:
            # chain topology (propagation worst case), capped at 40
            members = members[:40]
            for a, b in zip(members, members[1:]):
                edges.append((a, b))
        else:
            # random spanning edges + extras
            for m in members[1:]:
                peer = members[int(rng.integers(0, members.index(m)))]
                edges.append((m, peer))
            for _ in range(size // 4):
                a = members[int(rng.integers(0, len(members)))]
                b = members[int(rng.integers(0, len(members)))]
                if a != b:
                    edges.append((a, b))
        root = min(members)
        for m in members:
            golden[m] = root
    return edges, golden


def pages_df(spark, n: int = 500):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(page_rows(n), schema)


def alias_df(spark, n_entities: int = 200):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("alias_norm", T.StringType(), False),
            T.StructField("entity_id", T.LongType(), False),
            T.StructField("canonical_name", T.StringType(), False),
            T.StructField("prior", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(alias_rows(n_entities), schema)


def sameas_df(spark, n_clusters: int = 50):
    from pyspark.sql import types as T

    edges, golden = sameas_edge_rows(n_clusters)
    schema = T.StructType(
        [
            T.StructField("src", T.LongType(), False),
            T.StructField("dst", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(edges, schema), golden


def linked_page_rows(n: int = 300, links_per_page: int = 3):
    """pages rows whose html embeds deterministic ``<a href>`` anchors
    (the web link graph): each page links to ``links_per_page`` other
    FIXTURE pages with Zipf-skewed targets (low-index pages — and via
    the host assignment, one hub host — collect most in-links), plus
    one RELATIVE link (resolves to the page's own host, so it survives
    ``link_edges`` but drops at ``host_graph``'s self-host filter)."""
    rows = page_rows(n)
    rng = np.random.default_rng(SEED + 9)
    out = []
    for i, (url, ts, html, text, lang) in enumerate(rows):
        anchors = []
        for _ in range(links_per_page):
            j = int(rng.zipf(1.4)) % n
            if j != i:
                anchors.append(f'<a href="{rows[j][0]}">x</a>')
        anchors.append('<a href="/local/page">rel</a>')
        body = html.decode("utf-8").replace(
            "</body>", "".join(anchors) + "</body>"
        )
        out.append((url, ts, body.encode("utf-8"), text, lang))
    return out


def linked_pages_df(spark, n: int = 300, links_per_page: int = 3):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(linked_page_rows(n, links_per_page), schema)
