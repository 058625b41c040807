"""Randomized parity tests: Spark tag/span/metric operators vs
independent pure-Python reference implementations (conlleval
semantics), over seeded random label corpora.

The reference's own headline numbers come from the Perl conlleval
script; this file is our stand-in oracle for it (SURVEY §5 item 3),
implementing the chunk rules directly from the public conlleval
algorithm: a chunk starts at B-/S- always, and at I-/E- when the
previous tag does not continue the same type; it ends symmetrically.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

TYPES = ["PER", "ORG", "LOC", "MISC"]


# ---------- pure-Python references (no Spark) ----------
def py_bio_to_bioes(labels):
    out = []
    for i, lab in enumerate(labels):
        nxt = labels[i + 1] if i + 1 < len(labels) else None
        if lab == "O":
            out.append("O")
        elif lab.startswith("B-"):
            t = lab[2:]
            out.append(lab if nxt == f"I-{t}" else f"S-{t}")
        elif lab.startswith("I-"):
            t = lab[2:]
            out.append(lab if nxt == f"I-{t}" else f"E-{t}")
        else:
            out.append(lab)
    return out


def py_chunks(labels):
    """conlleval chunk extraction -> set of (start_pos, end_pos, type)."""
    chunks = []
    cur_start, cur_type = None, None
    prev = None
    for i, lab in enumerate(labels):
        starts = False
        if lab != "O":
            t = lab.split("-", 1)[1]
            p = lab.split("-", 1)[0]
            prev_continues = prev in (f"B-{t}", f"I-{t}")
            if p in ("B", "S"):
                starts = True
            elif p in ("I", "E") and not prev_continues:
                starts = True
        if lab == "O" or starts:
            if cur_start is not None:
                chunks.append((cur_start, i, cur_type))
                cur_start, cur_type = None, None
        if lab != "O" and (starts or cur_start is None):
            cur_start, cur_type = i, lab.split("-", 1)[1]
        prev = lab
    if cur_start is not None:
        chunks.append((cur_start, len(labels), cur_type))
    return set(chunks)


def py_phrase_f1(gold_sents, pred_sents):
    """per-type + ALL (tp, fp, fn) over chunk sets."""
    from collections import defaultdict

    tp, fp, fn = defaultdict(int), defaultdict(int), defaultdict(int)
    for g_labels, p_labels in zip(gold_sents, pred_sents):
        g, p = py_chunks(g_labels), py_chunks(p_labels)
        for c in g & p:
            tp[c[2]] += 1
            tp["ALL"] += 1
        for c in p - g:
            fp[c[2]] += 1
            fp["ALL"] += 1
        for c in g - p:
            fn[c[2]] += 1
            fn["ALL"] += 1
    return tp, fp, fn


def random_label_seq(rng, n, valid=True):
    """Random BIO sequence; valid=True keeps I- continuations legal,
    valid=False lets illegal I- appear (conlleval tolerates them)."""
    labels = []
    prev_type = None
    for _ in range(n):
        r = rng.random()
        if r < 0.55:
            labels.append("O")
            prev_type = None
        elif r < 0.8 or (valid and prev_type is None):
            t = TYPES[rng.integers(0, 4)]
            labels.append(f"B-{t}")
            prev_type = t
        else:
            t = prev_type if (valid and prev_type) else TYPES[rng.integers(0, 4)]
            labels.append(f"I-{t}")
            prev_type = t
    return labels


def _tokens_df(spark, sents_gold, sents_pred=None):
    rows = []
    for si, labels in enumerate(sents_gold):
        for pos, lab in enumerate(labels):
            pred = sents_pred[si][pos] if sents_pred else lab
            rows.append((f"d{si % 7}", si, pos, f"tok{pos}", pos, pos + 1, lab, pred))
    return spark.createDataFrame(
        rows,
        "doc_id string, sent_id long, pos int, token string, start long, end long, gold string, pred string",
    )


def test_bioes_conversion_parity_random(spark):
    rng = np.random.default_rng(1234)
    sents = [random_label_seq(rng, int(rng.integers(1, 25))) for _ in range(120)]
    df = _tokens_df(spark, sents)
    from neuroner_spark.functions.tags import with_bioes

    got = with_bioes(df, "gold", "bioes").orderBy("doc_id", "sent_id", "pos").collect()
    by_sent = {}
    for r in got:
        by_sent.setdefault(r["sent_id"], []).append(r["bioes"])
    for si, labels in enumerate(sents):
        assert by_sent[si] == py_bio_to_bioes(labels), si


def test_span_extraction_parity_random_including_illegal(spark):
    rng = np.random.default_rng(77)
    sents = [random_label_seq(rng, int(rng.integers(1, 30)), valid=False) for _ in range(150)]
    df = _tokens_df(spark, sents)
    from neuroner_spark.operators.spans import extract_spans

    got = extract_spans(df, label_col="gold").collect()
    got_set = {(r["sent_id"], r["start"], r["end"], r["type"]) for r in got}
    want = set()
    for si, labels in enumerate(sents):
        for s, e, t in py_chunks(labels):
            want.add((si, s, e, t))
    assert got_set == want


def test_conlleval_f1_parity_random(spark):
    rng = np.random.default_rng(4242)
    gold = [random_label_seq(rng, int(rng.integers(1, 30))) for _ in range(200)]
    # pred: corrupt ~20% of tokens (swap to O or different type)
    pred = []
    for labels in gold:
        p = []
        for lab in labels:
            r = rng.random()
            if r < 0.12:
                p.append("O")
            elif r < 0.2:
                t = TYPES[rng.integers(0, 4)]
                p.append(f"B-{t}")
            else:
                p.append(lab)
        pred.append(p)
    df = _tokens_df(spark, gold, pred)
    from neuroner_spark.operators.metrics import conlleval_f1

    got = {r["type"]: (r["tp"], r["fp"], r["fn"], r["precision"], r["recall"], r["f1"]) for r in conlleval_f1(df).collect()}
    tp, fp, fn = py_phrase_f1(gold, pred)
    for t in list(TYPES) + ["ALL"]:
        if t not in got:
            assert tp[t] == fp[t] == fn[t] == 0
            continue
        gtp, gfp, gfn, gp, gr, gf1 = got[t]
        assert (gtp, gfp, gfn) == (tp[t], fp[t], fn[t]), t
        prec = tp[t] / (tp[t] + fp[t]) if tp[t] + fp[t] else 0.0
        rec = tp[t] / (tp[t] + fn[t]) if tp[t] + fn[t] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        assert gp == pytest.approx(prec, abs=1e-6)
        assert gr == pytest.approx(rec, abs=1e-6)
        assert gf1 == pytest.approx(f1, abs=1e-6)


def test_conlleval_report_render_parse_roundtrip(spark):
    """F5: the conlleval TEXT report format — render our metrics into
    the canonical layout, parse it back, values round-trip; and parse
    a verbatim report as the Perl script prints it (the published
    conlleval example), proving reference-log compatibility."""
    from neuroner_spark.operators.metrics import (
        conlleval_f1,
        parse_conlleval_report,
        render_conlleval_report,
        token_accuracy,
    )

    rng = np.random.default_rng(7)
    gold = [random_label_seq(rng, int(rng.integers(1, 20))) for _ in range(60)]
    pred = [["O" if rng.random() < 0.15 else lab for lab in labels] for labels in gold]
    df = _tokens_df(spark, gold, pred)
    f1_rows = [r.asDict() for r in conlleval_f1(df).collect()]
    acc_row = token_accuracy(df).collect()[0]
    report = render_conlleval_report(f1_rows, acc_row["accuracy"], acc_row["n_tokens"])
    parsed = parse_conlleval_report(report)
    assert parsed["n_tokens"] == acc_row["n_tokens"]
    assert parsed["accuracy"] == pytest.approx(acc_row["accuracy"], abs=5e-5)
    by_type = {r["type"]: r for r in f1_rows}
    assert parsed["n_phrases"] == by_type["ALL"]["tp"] + by_type["ALL"]["fn"]
    assert parsed["n_correct"] == by_type["ALL"]["tp"]
    for t, want in by_type.items():
        got = parsed["types"][t]
        # report prints 2 decimals of percent -> 5e-5 fraction tolerance
        assert got["precision"] == pytest.approx(want["precision"], abs=5e-5), t
        assert got["recall"] == pytest.approx(want["recall"], abs=5e-5), t
        assert got["f1"] == pytest.approx(want["f1"], abs=5e-5), t
    # verbatim Perl-script output (canonical conlleval example layout)
    perl = (
        "processed 47377 tokens with 5942 phrases; "
        "found: 5798 phrases; correct: 5131.\n"
        "accuracy:  97.01%; precision:  88.50%; recall:  86.35%; FB1:  87.41\n"
        "              LOC: precision:  91.52%; recall:  90.67%; FB1:  91.09  1819\n"
        "             MISC: precision:  79.10%; recall:  76.69%; FB1:  77.88  894\n"
    )
    p2 = parse_conlleval_report(perl)
    assert p2["n_tokens"] == 47377 and p2["n_correct"] == 5131
    assert p2["types"]["ALL"]["f1"] == pytest.approx(0.8741, abs=1e-6)
    assert p2["types"]["LOC"]["found"] == 1819
    assert p2["types"]["MISC"]["precision"] == pytest.approx(0.791, abs=1e-6)
    with pytest.raises(ValueError):
        parse_conlleval_report("not a report")
    # ADVICE r3: rows without an ALL summary (empty eval set) must fail
    # with a descriptive error, not a KeyError
    with pytest.raises(ValueError, match="ALL"):
        render_conlleval_report(
            [{"type": "LOC", "tp": 1, "fp": 0, "fn": 0,
              "precision": 1.0, "recall": 1.0, "f1": 1.0}],
            accuracy=1.0,
            n_tokens=1,
        )


def test_assign_sequential_ids_matches_global_window(spark):
    """Property: two-phase id assignment == row_number() over a global
    window, on skewed random data with heavy ties on the first key."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from neuroner_spark.operators.ids import assign_sequential_ids

    rng = random.Random(7)
    rows = [(f"tok{i:04d}", rng.choice([1, 1, 1, 2, 3, 50])) for i in range(3000)]
    df = spark.createDataFrame(rows, "token string, cnt long").repartition(16)
    got = {
        r["token"]: r["idx"]
        for r in assign_sequential_ids(df, [F.desc("cnt"), F.asc("token")], n_partitions=7).collect()
    }
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    want = {
        r["token"]: r["idx"]
        for r in df.withColumn("idx", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want
