"""Corpus-prep pipeline: composition semantics (exact -> near-dup ->
decontamination -> quality gates), manifest/lineage, and resume."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

CLEAN = [
    "the quick brown fox jumps over a lazy dog near this river bank today",
    "a small team of engineers built the new bridge across that valley in record time",
    "she walked to the market this morning and bought fresh bread for her family",
]
# near-dup pair: long shared core, one trailing word differs
NEAR_CORE = (
    "large language models are trained on the text of the public web after careful "
    "filtering and deduplication of the source pages collected by the crawler"
)
# giant cluster: shared core plus a tiny per-doc suffix
GIANT_CORE = (
    "breaking news tonight as council members voted to approve plans for expanding "
    "harbor facilities while local residents voiced support and the officials promised "
    "careful oversight during construction"
)
SPAM = "buy now " * 30  # top-bigram/word dominated -> Gopher-flagged
BENCH_SENT = (
    "what is the capital of france the capital of france is paris of course"
)


def _docs(spark):
    rows = []
    did = 0
    for t in CLEAN:
        rows.append((did, t))
        did += 1
    # exact dups of clean doc 0
    rows += [(did, CLEAN[0]), (did + 1, CLEAN[0])]
    did += 2
    near_a, near_b = did, did + 1
    rows += [(near_a, NEAR_CORE + " yesterday"), (near_b, NEAR_CORE + " today")]
    did += 2
    giant_ids = list(range(did, did + 8))
    rows += [(g, GIANT_CORE + f" extra{g}") for g in giant_ids]
    did += 8
    spam_id, contam_id, short_id = did, did + 1, did + 2
    rows += [
        (spam_id, SPAM.strip()),
        (contam_id, "before the quiz remember this " + BENCH_SENT + " and good luck"),
        (short_id, "hi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ids = {
        "clean": [0, 1, 2],
        "exact_dups": [3, 4],
        "near": (near_a, near_b),
        "giant": giant_ids,
        "spam": spam_id,
        "contam": contam_id,
        "short": short_id,
    }
    return docs, ids


@pytest.fixture(scope="module")
def prep_out(spark, tmp_path_factory):
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    docs, ids = _docs(spark)
    bench = spark.createDataFrame([(0, BENCH_SENT)], "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("corpus_prep"))
    res = run_corpus_prep(
        spark, docs, out, benchmark=bench, max_bucket=3, contamination_n=8
    )
    return docs, ids, bench, out, res


def test_corpus_prep_semantics(prep_out):
    docs, ids, bench, out, res = prep_out
    kept = sorted(r["doc_id"] for r in res["corpus"].select("doc_id").collect())
    # clean docs survive
    for d in ids["clean"]:
        assert d in kept
    # exact dups of clean 0 are gone (min id kept)
    assert not set(ids["exact_dups"]) & set(kept)
    # near-dup pair collapses to its min id
    a, b = ids["near"]
    assert a in kept and b not in kept
    # the 8-member giant cluster (> max_bucket=3) collapses to one via
    # star edges, never pairs
    assert ids["giant"][0] in kept
    assert not set(ids["giant"][1:]) & set(kept)
    # spam fails the Gopher repetition gate; contaminated doc is routed
    # out by decontamination; the 1-token doc fails min_quality
    assert ids["spam"] not in kept
    assert ids["contam"] not in kept
    assert ids["short"] not in kept
    # ...but ALL of them are visible upstream: components has one row
    # per exact-deduped doc, keep=true for the short singleton
    comp = {r["doc_id"]: r for r in res["components"].collect()}
    assert comp[ids["short"]]["keep"] is True
    assert all(comp[g]["component"] == ids["giant"][0] for g in ids["giant"])


def test_corpus_prep_lineage_and_giant_visibility(prep_out):
    docs, ids, bench, out, res = prep_out
    stages = [m["stage"] for m in res["lineage"]]
    assert stages == [
        "exact_deduped",
        "banded",
        "giant_buckets",
        "near_components",
        "near_deduped",
        "contamination",
        "quality",
        "corpus",
    ]
    by = {m["stage"]: m for m in res["lineage"]}
    # the no-silent-caps audit: capped clusters are countable from the
    # manifest alone
    assert by["giant_buckets"]["n_rows"] >= 1
    for m in res["lineage"]:
        assert m["n_rows"] >= 0 and "fingerprint" in m and "n_partitions" in m
    # manifests exist on disk
    assert os.path.exists(os.path.join(out, "lineage.json"))
    with open(os.path.join(out, "giant_buckets", "_manifest.json")) as f:
        assert json.load(f)["stage"] == "giant_buckets"
    # per-CC-iteration walls (r6, r5 verdict #5): every large/small-star
    # round is attributed in the manifest, and it survives on disk so a
    # resumed run replays the original attribution
    cc = by["near_components"]["cc_iterations"]
    assert len(cc) >= 1
    for it in cc:
        # the small-edge-set driver fast path (r6) tags its single
        # entry with mode='driver'; star-loop rounds carry no mode
        assert set(it) - {"mode"} == {"iter", "edges", "wall_sec"}
        assert it["wall_sec"] >= 0
    with open(os.path.join(out, "near_components", "_manifest.json")) as f:
        assert json.load(f)["cc_iterations"] == cc


def test_corpus_prep_span_removal_stage(spark, tmp_path):
    """remove_dup_spans=True inserts the C4 removal stage: the
    non-first occurrence of a duplicated 3-sentence block is excised
    from the surviving doc's text, and downstream gates run on the
    cleaned text."""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    block = "Shared sentence alpha one. Shared sentence beta two! Shared sentence gamma three?"
    filler0 = (
        "this document keeps talking about rivers and bridges in several more words "
        "so that the quality gate sees enough tokens and variety overall."
    )
    filler1 = (
        "meanwhile a second article discusses markets and weather patterns with "
        "plenty of other vocabulary to keep the near-dup stage far from matching."
    )
    rows = [
        (0, "Opening statement for doc zero. " + block + " " + filler0),
        (1, "Different opening for doc one entirely. " + block + " " + filler1 + " Extra tail."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_dir = str(tmp_path / "prep")
    res = run_corpus_prep(spark, docs, out_dir, remove_dup_spans=True, max_bucket=100)
    stages = [m["stage"] for m in res["lineage"]]
    assert "span_cleaned" in stages
    kept = {r["doc_id"]: r for r in res["near_deduped"].collect()}
    assert "Shared sentence beta two!" in kept[0]["text"]
    assert "Shared sentence beta two!" not in kept[1]["text"]
    assert kept[1]["n_removed_sentences"] == 3
    assert "Extra tail." in kept[1]["text"]


def test_corpus_prep_lang_gate(spark, tmp_path):
    """keep_lang inserts the CCNet-style gate right after exact dedup:
    the German page never reaches banding/components; the English
    pages flow through unchanged."""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    rows = [
        (0, CLEAN[0]),
        (1, CLEAN[1]),
        (2, "der hund und die katze sind nicht mit dem mann auf das feld gegangen und es war gut"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_dir = str(tmp_path / "prep")
    res = run_corpus_prep(spark, docs, out_dir, keep_lang="en", max_bucket=100)
    by = {m["stage"]: m for m in res["lineage"]}
    assert by["exact_deduped"]["n_rows"] == 3
    assert by["lang_gate"]["n_rows"] == 2
    comp_ids = sorted(r["doc_id"] for r in res["components"].collect())
    assert comp_ids == [0, 1]
    kept = sorted(r["doc_id"] for r in res["corpus"].collect())
    assert kept == [0, 1]


def test_corpus_prep_lang_gate_drops_cjk(spark, tmp_path):
    """r6 (r5 verdict Missing #1): before script routing, unsegmented
    pages scored ~0 on every stopword list and misrouted to 'en' (the
    zero-score tie-break) — a keep_lang='en' gate LEAKED them into the
    corpus.  With script-ratio routing they are detected and dropped."""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    rows = [
        (0, CLEAN[0]),
        (1, CLEAN[1]),
        (2, "今天天气很好我们去公园散步吧这里的风景非常美丽大家都很开心"),
        (3, "วันนี้อากาศดีมากเราไปเดินเล่นที่สวนสาธารณะกันเถอะ"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_dir = str(tmp_path / "prep")
    res = run_corpus_prep(spark, docs, out_dir, keep_lang="en", max_bucket=100)
    by = {m["stage"]: m for m in res["lineage"]}
    assert by["lang_gate"]["n_rows"] == 2
    kept = sorted(r["doc_id"] for r in res["corpus"].collect())
    assert kept == [0, 1]


def test_corpus_prep_resume_and_invalidation(spark, prep_out):
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    docs, ids, bench, out, res = prep_out
    # rerun: every stage resumes from its manifest
    res2 = run_corpus_prep(
        spark, docs, out, benchmark=bench, max_bucket=3, contamination_n=8
    )
    assert all(m.get("resumed") for m in res2["lineage"]), res2["lineage"]
    assert sorted(r["doc_id"] for r in res2["corpus"].collect()) == sorted(
        r["doc_id"] for r in res["corpus"].collect()
    )
    # parameter change invalidates exactly the stages it affects:
    # max_bucket feeds giant_buckets/components/corpus but NOT the
    # exact-dedup or the banded scan
    res3 = run_corpus_prep(
        spark, docs, out, benchmark=bench, max_bucket=100, contamination_n=8
    )
    by = {m["stage"]: m for m in res3["lineage"]}
    assert by["exact_deduped"].get("resumed") and by["banded"].get("resumed")
    assert not by["giant_buckets"].get("resumed")
    assert not by["near_components"].get("resumed")
    assert not by["corpus"].get("resumed")


def test_corpus_prep_winnow_stage(spark, tmp_path):
    """winnow=True inserts the partial-overlap dedup stage: two docs
    sharing a long PASSAGE (but dissimilar overall, so the banded
    whole-doc near-dup stage keeps both) collapse to the min-id one;
    the stage family shows up in lineage (incl. the no-silent-caps
    giant-fp side output) and resumes/invalidates like every other."""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    shared = (
        "the committee released its quarterly findings on infrastructure spending "
        "and highlighted several bridges requiring immediate structural attention"
    )
    rows = [
        (0, "alpha begins with completely original prose about gardens and the seasons. "
            + shared + " afterwards alpha wanders toward recipes and the cooking of stews."),
        (1, "bravo instead covers maritime navigation and the charting of coastal waters. "
            + shared + " bravo then returns to lighthouses and the keeping of logs."),
        (2, "charlie writes only of astronomy telescopes nebulae and the motion of planets "
            "with a vocabulary chosen to overlap nobody else in this tiny corpus at all."),
        (3, "delta discusses woodworking joinery dovetails and the seasoning of timber "
            "using yet another disjoint set of words for the benefit of this test."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_dir = str(tmp_path / "prep")
    kw = dict(winnow=True, winnow_k=8, winnow_w=4, winnow_min_shared=8, max_bucket=100)
    res = run_corpus_prep(spark, docs, out_dir, **kw)
    stages = [m["stage"] for m in res["lineage"]]
    for st in ["winnow_fps", "winnow_giant_fps", "winnow_components", "winnow_deduped"]:
        assert st in stages, stages
    # banded whole-doc near-dup kept all 4 (the docs are NOT global
    # near-dups)...
    by = {m["stage"]: m for m in res["lineage"]}
    assert by["near_deduped"]["n_rows"] == 4
    # ...but winnowing collapses the shared-passage pair to doc 0
    assert by["winnow_deduped"]["n_rows"] == 3
    kept = sorted(r["doc_id"] for r in res["near_deduped"].collect())
    assert kept == [0, 2, 3]
    # resume: identical rerun resumes every stage
    res2 = run_corpus_prep(spark, docs, out_dir, **kw)
    assert all(m.get("resumed") for m in res2["lineage"]), res2["lineage"]
    # invalidation: min_shared feeds components (and below) but NOT
    # the fingerprint scan or the banded stage
    kw3 = dict(kw, winnow_min_shared=12)
    res3 = run_corpus_prep(spark, docs, out_dir, **kw3)
    by3 = {m["stage"]: m for m in res3["lineage"]}
    assert by3["banded"].get("resumed") and by3["winnow_fps"].get("resumed")
    assert not by3["winnow_components"].get("resumed")
    assert not by3["corpus"].get("resumed")


def test_corpus_prep_simhash_method(spark, tmp_path):
    """near_method='simhash' (r6): same stage contract as minhash but
    the shared scan is one 64-bit signature per doc.  Covers the three
    simhash-specific paths — exact-signature PILES (simhash is a bag
    of tokens, so a token-REORDERED doc piles at hamming 0 even though
    exact dedup's text fingerprint missed it), verified pigeonhole
    pairs (suffix-perturbed cluster), and the giant_blocks audit
    (max_bucket=3 puts the 6-doc cluster's shared block values over
    cap -> DROPPED from pairing, visible in lineage — doc 21 surviving
    is that drop's footprint: its pair evidence sat in over-cap
    blocks)."""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    giant = (
        "breaking news tonight as council members voted to approve plans for expanding "
        "harbor facilities while local residents voiced support and the officials promised "
        "careful oversight during construction"
    )
    long_core = giant + " " + giant.replace("breaking", "striking")
    clean0 = "the quick brown fox jumps over a lazy dog near this river bank today"
    clean1 = "a small team of engineers built the new bridge across that valley in record time"
    rows = [(0, clean0), (1, clean1), (2, " ".join(reversed(clean0.split())))]
    rows += [(20 + g, long_core + f" extra{g}") for g in range(6)]
    rows += [(50, "an unrelated singleton document describing watermark semantics in some detail")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = str(tmp_path / "prep_simhash")
    res = run_corpus_prep(
        spark, docs, out, near_method="simhash", max_bucket=3, min_quality=0.0
    )
    assert [m["stage"] for m in res["lineage"]] == [
        "exact_deduped",
        "simhash_sigs",
        "giant_buckets",
        "near_components",
        "near_deduped",
        "quality",
        "corpus",
    ]
    comp = {r["doc_id"]: r for r in res["components"].collect()}
    # pile path: the reordered doc has the SAME signature as doc 0
    assert comp[2]["component"] == 0 and not comp[2]["keep"]
    # pair path: cluster members whose shared blocks stayed under cap
    for d in (22, 23, 24, 25):
        assert comp[d]["component"] == 20 and not comp[d]["keep"]
    # the drop's footprint: 21's pair evidence was in over-cap blocks
    assert comp[21]["keep"]
    # no-silent-caps: the dropped block values are countable from lineage
    by = {m["stage"]: m for m in res["lineage"]}
    assert by["giant_buckets"]["n_rows"] == 2
    assert len(by["near_components"]["cc_iterations"]) >= 1
    assert sorted(r["doc_id"] for r in res["corpus"].select("doc_id").collect()) == [
        0, 1, 20, 21, 50,
    ]

    # resume: every stage replays from its manifest
    res2 = run_corpus_prep(
        spark, docs, out, near_method="simhash", max_bucket=3, min_quality=0.0
    )
    assert all(m.get("resumed") for m in res2["lineage"]), res2["lineage"]
    # d feeds pairing but not the signature scan: changing it rebuilds
    # giant_buckets/near_components and leaves simhash_sigs resumed
    res3 = run_corpus_prep(
        spark, docs, out, near_method="simhash", max_bucket=3, min_quality=0.0,
        simhash_max_hamming=2,
    )
    by3 = {m["stage"]: m for m in res3["lineage"]}
    assert by3["simhash_sigs"].get("resumed")
    assert not by3["giant_buckets"].get("resumed")
    assert not by3["near_components"].get("resumed")


def test_incremental_snapshot_store(spark, tmp_path):
    """Snapshot store E2E: snapshot 0 seeds the band store; snapshot 1
    dedups against it via signatures only; a retried snapshot
    overwrites its own partition (idempotent under retry)."""
    from neuroner_spark.plans.corpus_pipeline import run_incremental_snapshot

    store = str(tmp_path / "store")
    base = (
        "the quick brown fox jumps over the lazy dog while the merge sort "
        "algorithm scans the big table and the hash join builds its side"
    )
    snap0 = spark.createDataFrame(
        [(1, base), (2, "some totally unrelated page about streaming state")],
        "doc_id long, text string",
    )
    r0 = run_incremental_snapshot(spark, snap0, store, snapshot_id=0)
    assert r0["n_kept"] == 2 and r0["n_dup_of_corpus"] == 0

    snap1 = spark.createDataFrame(
        [
            (10, base),  # near/exact dup of ingested doc 1
            (11, "fresh never-seen content about inverted file probes"),
            (12, "fresh never-seen content about inverted file probes"),  # batch dup of 11
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_snapshot(spark, snap1, store, snapshot_id=1)
    d1 = {r["doc_id"]: r for r in r1["decisions"].collect()}
    assert d1[10]["status"] == "dup_of_corpus" and d1[10]["dup_of"] == 1
    assert d1[11]["status"] == "kept"
    assert d1[12]["status"] == "dup_of_batch" and d1[12]["dup_of"] == 11

    # retry of snapshot 1: same decisions, store NOT doubled — the next
    # snapshot still sees exactly one copy of doc 11's bands
    r1b = run_incremental_snapshot(spark, snap1, store, snapshot_id=1)
    assert {r["doc_id"]: r["status"] for r in r1b["decisions"].collect()} == {
        k: v["status"] for k, v in d1.items()
    }
    bands = spark.read.parquet(f"{store}/bands/snapshot=1")
    assert bands.select("doc_id").distinct().count() == 1  # only doc 11 kept

    snap2 = spark.createDataFrame(
        [(20, "fresh never-seen content about inverted file probes")],
        "doc_id long, text string",
    )
    r2 = run_incremental_snapshot(spark, snap2, store, snapshot_id=2)
    d2 = r2["decisions"].collect()[0]
    assert d2["status"] == "dup_of_corpus" and d2["dup_of"] == 11


def test_band_store_compaction(spark, tmp_path):
    """Compaction parity: folding snapshots into the keyed table (with
    raw partitions pruned) leaves every later decision identical —
    min(min(covered), tail) == min(all).  Re-compaction at a higher
    watermark merges the existing compacted table with the raw tail."""
    from neuroner_spark.plans.corpus_pipeline import (
        _band_store_inputs,
        compact_band_store,
        run_incremental_snapshot,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the merge sort "
        "algorithm scans the big table and the hash join builds its side"
    )
    other = "some totally unrelated page about streaming state"
    fresh = "fresh never-seen content about inverted file probes"
    snap0 = [(1, base), (2, other)]
    snap1 = [(10, fresh), (11, fresh)]  # 11 -> dup_of_batch of 10
    probe = [(20, base), (21, fresh), (22, "never seen anywhere zxqv")]

    def build(store, compact_after=None, prune=False):
        for sid, rows in enumerate([snap0, snap1]):
            run_incremental_snapshot(
                spark,
                spark.createDataFrame(rows, "doc_id long, text string"),
                store,
                snapshot_id=sid,
            )
            if compact_after == sid:
                info = compact_band_store(spark, store, prune=prune)
                assert info["upto"] == sid
                assert info["n_band_keys"] <= info["n_raw_rows"]
        r = run_incremental_snapshot(
            spark,
            spark.createDataFrame(probe, "doc_id long, text string"),
            store,
            snapshot_id=9,
        )
        return {x["doc_id"]: (x["status"], x["dup_of"]) for x in r["decisions"].collect()}

    want = build(str(tmp_path / "plain"))
    assert want[20] == ("dup_of_corpus", 1) and want[21] == ("dup_of_corpus", 10)
    assert want[22][0] == "kept"
    # compact mid-stream (covered + raw tail union), no prune
    assert build(str(tmp_path / "mid"), compact_after=0) == want
    # compact everything, prune raw partitions — index survives alone
    store_all = str(tmp_path / "all")
    assert build(store_all, compact_after=1, prune=True) == want
    import os

    raw_left = [d for d in os.listdir(f"{store_all}/bands") if d != "snapshot=9"]
    assert raw_left == []  # covered raw partitions gone
    # decisions audit record untouched by prune
    assert len(os.listdir(f"{store_all}/decisions")) == 3


def test_band_store_recompaction_idempotent(spark, tmp_path):
    from neuroner_spark.plans.corpus_pipeline import (
        _band_store_inputs,
        compact_band_store,
        run_incremental_snapshot,
    )

    store = str(tmp_path / "store")
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    run_incremental_snapshot(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string"),
        store,
        snapshot_id=0,
    )
    a = compact_band_store(spark, store)
    b = compact_band_store(spark, store)  # retry at same watermark
    assert a["upto"] == b["upto"] == 0
    assert a["n_band_keys"] == b["n_band_keys"]
    # reader sees exactly one input (the compacted table), raw skipped
    paths = _band_store_inputs(store)
    assert len(paths) == 1 and "compacted" in paths[0]
    got = spark.read.parquet(paths[0])
    assert got.count() == got.select("band_id", "band_hash").distinct().count()


def test_corpus_prep_lm_gate(spark, tmp_path):
    """CCNet-order LM gate mechanics on the driver corpus: the gate
    drops EXACTLY the above-threshold perplexity tail of the docs the
    other gates kept (the LM trains on the deduped corpus, so the
    score table is deterministic); kept docs are all <= threshold or
    unscorable; resume works and the threshold only invalidates the
    corpus stage.  (Separation of repetitive vs gibberish text is the
    operator-level test in test_quality_lm.py — the synthetic filler
    corpus here is near-uniform, so the gate is exercised as a tail
    cut.)"""
    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    base = run_corpus_prep(spark, docs, str(tmp_path / "no_lm"), fast_hash=True)
    kept_base = {r["doc_id"] for r in base["corpus"].select("doc_id").collect()}
    out = str(tmp_path / "lm_prep")
    res = run_corpus_prep(spark, docs, out, lm_max_bits=5.0, fast_hash=True)
    kept = {r["doc_id"] for r in res["corpus"].select("doc_id").collect()}
    scores = {r["doc_id"]: r["avg_nll_bits"] for r in res["lm_scores"].collect()}
    expected_drop = {
        d for d in kept_base if scores.get(d) is not None and scores[d] > 5.0
    }
    assert expected_drop, "fixture must have an above-threshold tail"
    assert kept_base - kept == expected_drop
    assert all(scores[d] is None or scores[d] <= 5.0 for d in kept)
    # resume: same params -> every stage resumed
    res2 = run_corpus_prep(spark, docs, out, lm_max_bits=5.0, fast_hash=True)
    assert all(m.get("resumed") for m in res2["lineage"])
    # threshold change invalidates corpus only, lm_scores resumes
    res3 = run_corpus_prep(spark, docs, out, lm_max_bits=4.9, fast_hash=True)
    by = {m["stage"]: m for m in res3["lineage"]}
    assert by["lm_scores"].get("resumed")
    assert not by["corpus"].get("resumed")
