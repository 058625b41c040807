"""Distributed output-layer training (O3/A8/F6/K4): loss decreases,
accuracy beats the untrained head, early stopping and checkpoints work."""

import os

import pytest
from pyspark.sql import functions as F

from neuroner_spark.functions.tags import with_bioes
from neuroner_spark.model.train import train_output_layer
from neuroner_spark.model.weights import build_vocab, load_bundle, make_bundle
from neuroner_spark.plans.catalog_ner import pseudo_tokens

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    toks = pseudo_tokens(spark, SF)
    return with_bioes(toks, "gold", "label").select(
        "doc_id", "sent_id", "pos", "token", "label"
    )


def _accuracy(spark, tokens, bundle):
    from neuroner_spark.model.tagger import tag_tokens

    tagged = tag_tokens(
        spark, tokens.withColumn("start", F.col("pos").cast("long")).withColumn(
            "end", (F.col("pos") + 1).cast("long")
        ),
        bundle,
        n_partitions=4,
        use_crf=False,
    )
    joined = tagged.withColumnRenamed("label", "pred").join(
        tokens.select("doc_id", "sent_id", "pos", F.col("label").alias("gold")),
        ["doc_id", "sent_id", "pos"],
    )
    return joined.agg(
        F.avg((F.col("pred") == F.col("gold")).cast("double")).alias("acc")
    ).collect()[0]["acc"]


def test_training_reduces_loss_and_improves_accuracy(spark, tmp_path):
    corpus = _corpus(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    acc_before = _accuracy(spark, corpus, bundle)

    ckpt = str(tmp_path / "ckpts")
    res = train_output_layer(
        spark, corpus, bundle, epochs=5, lr=1.0, patience=5, checkpoint_dir=ckpt
    )
    hist = res["history"]
    assert len(hist) >= 3
    # loss decreases epoch over epoch (convex head, fixed features)
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0]
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses

    acc_after = _accuracy(spark, corpus, res["bundle"])
    assert acc_after > acc_before, (acc_before, acc_after)

    # K4: per-epoch checkpoints exist and load
    ck0 = load_bundle(os.path.join(ckpt, "epoch_0"))
    assert ck0["arrays"]["out_W"].shape == bundle["arrays"]["out_W"].shape
    # only the head was trained (transfer-style: encoder frozen)
    import numpy as np

    assert np.array_equal(res["bundle"]["arrays"]["ff_W"], bundle["arrays"]["ff_W"])
    assert not np.array_equal(res["bundle"]["arrays"]["out_W"], bundle["arrays"]["out_W"])


def test_early_stopping_triggers(spark):
    corpus = _corpus(spark).limit(200)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    # lr=0 -> loss never improves -> patience stops after 1+patience epochs
    res = train_output_layer(spark, corpus, bundle, epochs=10, lr=0.0, patience=2)
    assert len(res["history"]) <= 4


def test_bptt_gradient_check():
    """Finite-difference check of the hand-derived BPTT (FF + token
    Bi-LSTM + embedding rows) in float64 — pure numpy, no Spark."""
    import numpy as np

    from neuroner_spark.model.bilstm_crf import (
        backward_features,
        forward_features,
        forward_features_cache,
    )

    rng = np.random.default_rng(0)
    bundle = make_bundle({"a": 1, "b": 2, "c": 3}, seed=7)
    arrays64 = {k: v.astype(np.float64) for k, v in bundle["arrays"].items()}
    B, T = 3, 4
    token_ids = rng.integers(0, 4, size=(B, T))
    char_feat = rng.normal(0, 0.5, size=(B, T, 50))
    lengths = np.array([4, 2, 3])
    mask = (np.arange(T)[None, :] < lengths[:, None])[:, :, None]
    R = rng.normal(size=(B, T, 100)) * mask  # linear loss L = sum(ff * R)

    def loss(arr):
        ff, _ = forward_features_cache(token_ids, char_feat, lengths, arr)
        return float((ff * R).sum())

    ff, cache = forward_features_cache(token_ids, char_feat, lengths, arrays64)
    # cached forward == inference forward
    ff_inf = forward_features(
        token_ids, char_feat.astype(np.float32), lengths, bundle["arrays"]
    )
    assert np.allclose(ff, ff_inf, atol=1e-4)
    grads, dx = backward_features(R, cache, arrays64)
    d_emb = np.zeros_like(arrays64["token_emb"])
    np.add.at(d_emb, token_ids.ravel(), dx[:, :, :100].reshape(-1, 100))
    grads = dict(grads, token_emb=d_emb)
    eps = 1e-6
    for name, g in grads.items():
        for fi in rng.choice(g.size, size=min(6, g.size), replace=False):
            ij = np.unravel_index(fi, g.shape)
            up = arrays64[name].copy()
            up[ij] += eps
            dn = arrays64[name].copy()
            dn[ij] -= eps
            num = (loss({**arrays64, name: up}) - loss({**arrays64, name: dn})) / (2 * eps)
            assert abs(num - g[ij]) <= 1e-5 * max(1.0, abs(num)), (name, ij, num, g[ij])

    # dropout path: gradients exact under a FIXED inverted-dropout mask
    # on the token-LSTM INPUT (reference site: token emb ++ char feat)
    dmask = (rng.random((B, T, 150)) >= 0.5) / 0.5

    def loss_d(arr):
        ff_, _ = forward_features_cache(token_ids, char_feat, lengths, arr, dropout_mask=dmask)
        return float((ff_ * R).sum())

    _, cache_d = forward_features_cache(token_ids, char_feat, lengths, arrays64, dropout_mask=dmask)
    grads_d, dx_d = backward_features(R, cache_d, arrays64)
    # embedding grad must chain through the input mask (dx * mask)
    d_emb_d = np.zeros_like(arrays64["token_emb"])
    np.add.at(d_emb_d, token_ids.ravel(), dx_d[:, :, :100].reshape(-1, 100))
    grads_d = dict(grads_d, token_emb=d_emb_d)
    for name in ("ff_W", "token_lstm_fw_U", "token_lstm_bw_W", "token_emb"):
        g = grads_d[name]
        for fi in rng.choice(g.size, size=4, replace=False):
            ij = np.unravel_index(fi, g.shape)
            up = arrays64[name].copy()
            up[ij] += eps
            dn = arrays64[name].copy()
            dn[ij] -= eps
            num = (loss_d({**arrays64, name: up}) - loss_d({**arrays64, name: dn})) / (2 * eps)
            assert abs(num - g[ij]) <= 1e-5 * max(1.0, abs(num)), ("dropout", name, ij)


def _corpus_in_domain(spark):
    """Pseudo corpus with entity types remapped INTO the model's label
    space (OP->PER, TECH->ORG, FN->LOC) so training targets are real
    classes, not all collapsed to O."""
    toks = pseudo_tokens(spark, SF)
    relab = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("gold", "-OP$", "-PER"), "-TECH$", "-ORG"),
        "-FN$",
        "-LOC",
    )
    toks = toks.withColumn("gold", relab)
    return with_bioes(toks, "gold", "label").select(
        "doc_id", "sent_id", "pos", "token", "label"
    )


def test_full_network_training_beats_head_only(spark, tmp_path):
    """Reference fit() parity: training the whole network from scratch
    reaches strictly better token accuracy than the head-only trainer
    (the head on frozen random features cannot beat the all-O
    majority-class plateau on this corpus; the full network can)."""
    import numpy as np

    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    head = train_output_layer(spark, corpus, bundle, epochs=6, lr=1.0, patience=6)
    acc_head = _accuracy(spark, corpus, head["bundle"])

    ckpt = str(tmp_path / "full_ckpts")
    full = train_full_network(
        spark,
        corpus,
        bundle,
        epochs=25,
        lr=1.0,
        patience=25,
        checkpoint_dir=ckpt,
        train_embeddings=True,
    )
    losses = [h["loss"] for h in full["history"]]
    assert losses[-1] < losses[0]
    acc_full = _accuracy(spark, corpus, full["bundle"])
    assert acc_full > acc_head, (acc_head, acc_full)
    # every layer actually moved (vs the head trainer's frozen encoder)
    for name in ("token_lstm_fw_W", "ff_W", "out_W", "token_emb"):
        assert not np.array_equal(full["bundle"]["arrays"][name], bundle["arrays"][name]), name
    # K4: per-epoch checkpoints exist and load
    ck = load_bundle(os.path.join(ckpt, "epoch_0"))
    assert ck["arrays"]["token_lstm_fw_W"].shape == bundle["arrays"]["token_lstm_fw_W"].shape


def test_full_network_early_stopping(spark):
    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark).limit(300)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    # lr=0 -> loss never improves -> patience stops after 1+patience epochs
    res = train_full_network(spark, corpus, bundle, epochs=10, lr=0.0, patience=2)
    assert len(res["history"]) <= 4


def test_crf_transition_training_reduces_errors(spark):
    """Structured perceptron on transitions: Viterbi errors decrease
    (trained head first so unaries carry signal)."""
    from neuroner_spark.model.train import train_crf_transitions

    corpus = _corpus(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    # raw seed bundle: random unaries -> many Viterbi errors; the
    # perceptron learns (mostly) strong ->O transitions and cuts them.
    # (With a trained head the decode is already error-free and the
    # perceptron correctly does nothing — asserted at the end.)
    bundle = make_bundle(vocab, seed=42)
    res = train_crf_transitions(spark, corpus, bundle, epochs=4, lr=0.5)
    errs = [h["token_errors"] for h in res["history"]]
    assert errs[-1] < errs[0], errs
    import numpy as np

    assert not np.array_equal(
        res["bundle"]["arrays"]["crf_transitions"], bundle["arrays"]["crf_transitions"]
    )
    assert np.array_equal(res["bundle"]["arrays"]["out_W"], bundle["arrays"]["out_W"])
    # trained-head fixpoint: zero errors -> loop exits after one epoch
    head = train_output_layer(spark, corpus, bundle, epochs=4, lr=1.0, patience=4)
    res2 = train_crf_transitions(spark, corpus, head["bundle"], epochs=4, lr=0.5)
    assert res2["history"][-1]["token_errors"] == 0


def test_full_network_crf_loss_training(spark):
    """Reference crf_log_likelihood objective end-to-end: sentence-level
    CRF NLL decreases and Viterbi-decoded accuracy improves over the
    untrained bundle; the transition matrix is part of the update."""
    import numpy as np

    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    acc_before = _accuracy_crf(spark, corpus, bundle)
    res = train_full_network(
        spark,
        corpus,
        bundle,
        epochs=6,
        lr=0.5,
        momentum=0.0,
        patience=6,
        loss="crf",
        train_embeddings=True,
    )
    losses = [h["loss"] for h in res["history"]]
    assert losses[-1] < losses[0] / 2, losses
    assert not np.array_equal(
        res["bundle"]["arrays"]["crf_transitions"], bundle["arrays"]["crf_transitions"]
    )
    acc_after = _accuracy_crf(spark, corpus, res["bundle"])
    assert acc_after > acc_before, (acc_before, acc_after)


def _accuracy_crf(spark, tokens, bundle):
    from neuroner_spark.model.tagger import tag_tokens

    tagged = tag_tokens(
        spark,
        tokens.withColumn("start", F.col("pos").cast("long")).withColumn(
            "end", (F.col("pos") + 1).cast("long")
        ),
        bundle,
        n_partitions=4,
        use_crf=True,
    )
    joined = tagged.withColumnRenamed("label", "pred").join(
        tokens.select("doc_id", "sent_id", "pos", F.col("label").alias("gold")),
        ["doc_id", "sent_id", "pos"],
    )
    return joined.agg(
        F.avg((F.col("pred") == F.col("gold")).cast("double")).alias("acc")
    ).collect()[0]["acc"]


def test_full_network_valid_f1_early_stopping(spark):
    """A8 reference criterion: patience tracks best VALID conlleval F1
    (not train loss); history records valid_f1 per epoch and the
    returned bundle is the best-F1 one."""
    from neuroner_spark.model.train import evaluate_f1, train_full_network

    corpus = _corpus_in_domain(spark)
    # doc-id split: even docs train, odd docs validate
    train = corpus.filter((F.col("doc_id").cast("long") % 2) == 0)
    valid = corpus.filter((F.col("doc_id").cast("long") % 2) == 1)
    vocab = build_vocab([r["token"] for r in train.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    # lr=0: F1 never improves after epoch 0 -> patience=2 stops by epoch 3
    res = train_full_network(
        spark, train, bundle, epochs=8, lr=0.0, patience=2, eval_tokens=valid
    )
    assert len(res["history"]) <= 4
    assert all("valid_f1" in h for h in res["history"])
    # the returned bundle is the best-F1 epoch's bundle and its F1 matches
    f1s = [h["valid_f1"] for h in res["history"]]
    assert res["best_epoch"] == f1s.index(max(f1s))
    # decode mode must match the trained objective (softmax -> argmax)
    assert abs(evaluate_f1(spark, valid, res["bundle"], use_crf=False) - max(f1s)) < 1e-9


def test_full_network_adam_and_dropout(spark):
    """Reference INI parity: optimizer=adam + dropout_rate train the
    full network; loss decreases and the run is deterministic (the
    dropout masks are seeded per epoch/sub-batch)."""
    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark).limit(2000)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    kw = dict(epochs=4, lr=0.02, patience=4, optimizer="adam", dropout=0.3)
    res1 = train_full_network(spark, corpus, bundle, **kw)
    losses = [h["loss"] for h in res1["history"]]
    assert losses[-1] < losses[0], losses
    res2 = train_full_network(spark, corpus, bundle, **kw)
    assert [h["loss"] for h in res2["history"]] == losses  # deterministic


def test_training_run_output_tree(spark, tmp_path):
    """Reference run-folder parity: fit -> checkpoints + predictions
    (parquet AND CoNLL text) + metrics table + results.json."""
    import json

    from neuroner_spark.plans.train_pipeline import run_training_run

    corpus = _corpus_in_domain(spark)
    train = corpus.filter((F.col("doc_id").cast("long") % 2) == 0)
    valid = corpus.filter((F.col("doc_id").cast("long") % 2) == 1)
    vocab = build_vocab([r["token"] for r in train.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    out = str(tmp_path / "run")
    res = run_training_run(
        spark, train, valid, bundle, out, epochs=2, lr=0.5, patience=2
    )
    assert os.path.isdir(os.path.join(out, "checkpoints", "epoch_0"))
    preds = spark.read.parquet(os.path.join(out, "predictions", "valid"))
    assert {"token", "gold", "pred"} <= set(preds.columns)
    assert preds.count() == valid.count()
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert "f1" in metrics.columns
    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    assert len(results["history"]) == 2 and "valid_f1" in results
    assert res["valid_f1"] == results["valid_f1"]
    # K1 text render exists and has content
    from neuroner_spark.sources.conll import read_conll

    back = read_conll(spark, os.path.join(out, "predictions", "valid_conll"))
    assert back.count() == valid.count()
    # F5: canonical conlleval text report, parse-verified against results.json
    from neuroner_spark.operators.metrics import parse_conlleval_report

    with open(os.path.join(out, "results_conlleval.txt")) as f:
        report = parse_conlleval_report(f.read())
    assert report["types"]["ALL"]["f1"] == pytest.approx(results["valid_f1"], abs=5e-5)
    # K5: TensorBoard event file with per-epoch loss scalars (CRC-verified read)
    from neuroner_spark.sources.tbevents import read_tb_events

    tb_dir = os.path.join(out, "tensorboard")
    tb_files = [os.path.join(tb_dir, n) for n in os.listdir(tb_dir)]
    assert len(tb_files) == 1 and "tfevents" in tb_files[0]
    events = read_tb_events(tb_files[0])
    assert events[0]["file_version"] == "brain.Event:2"
    losses = {e["step"]: e["scalars"]["train/loss"] for e in events if "train/loss" in e["scalars"]}
    assert set(losses) == {0, 1}
    for h in results["history"]:
        assert losses[h["epoch"]] == pytest.approx(h["loss"], rel=1e-6)
    # K3 plot half: both utils_plots-parity SVG heatmaps exist and parse
    import xml.etree.ElementTree as ET

    for name in ("classification_report_valid.svg", "confusion_matrix_valid.svg"):
        with open(os.path.join(out, "plots", name)) as f:
            ET.fromstring(f.read())


def test_sparse_embedding_gradient_rows(spark):
    """The per-partition gradient row is O(touched tokens), never
    O(vocab): with a large hashed vocab (vocab_size >> corpus tokens)
    the emb_grad payload stays bounded by the distinct tokens seen."""
    import numpy as np

    from neuroner_spark.model.train import (
        GRAD_SCHEMA,
        _labeled_sentences,
        _make_full_grad_fn,
    )
    from neuroner_spark.model.weights import LABELS, TOKEN_DIM

    corpus = _corpus_in_domain(spark).limit(1500)
    n_distinct = corpus.select("token").distinct().count()
    bundle = make_bundle(200_000, seed=42)  # hashed mode, huge table
    label_to_idx = {l: i for i, l in enumerate(LABELS)}
    sents = _labeled_sentences(corpus).repartition(4)
    bc = spark.sparkContext.broadcast(bundle)
    rows = sents.mapInPandas(
        _make_full_grad_fn(bc, label_to_idx, True, "softmax"), GRAD_SCHEMA
    ).collect()
    for r in rows:
        assert len(r["emb_ids"]) <= n_distinct + 1  # +1 for padding id 0
        assert len(r["emb_grad"]) == len(r["emb_ids"]) * TOKEN_DIM
        # dense part excludes the 200k x 100 embedding table
        assert len(r["grad"]) < 250_000


def test_two_level_agg_parity(spark):
    """treeAggregate gradient path (two_level_agg): with one group per
    partition the executor pre-sum is an identity re-packaging, so the
    trained bundle must be BIT-FOR-BIT identical to the plain-collect
    path; with real pre-summing (agg_groups=2) the only difference is
    float64 re-association — parity to ~1e-12."""
    import numpy as np

    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    kw = dict(epochs=2, lr=0.5, patience=3, train_embeddings=True, seed=7)
    base = train_full_network(spark, corpus, bundle, **kw)
    # k >= n_partitions: every group holds exactly one partition row ->
    # identical fold order -> bit-for-bit
    same = train_full_network(
        spark, corpus, bundle, two_level_agg=True, agg_groups=1_000_000, **kw
    )
    assert same["history"] == base["history"]
    for name, arr in base["bundle"]["arrays"].items():
        assert np.array_equal(same["bundle"]["arrays"][name], arr), name
    # real pre-summing: groups of partitions fold executor-side first
    two = train_full_network(
        spark, corpus, bundle, two_level_agg=True, agg_groups=2, **kw
    )
    assert [h["n_tokens"] for h in two["history"]] == [h["n_tokens"] for h in base["history"]]
    for h2, hb in zip(two["history"], base["history"]):
        assert h2["loss"] == pytest.approx(hb["loss"], rel=1e-9)
    for name, arr in base["bundle"]["arrays"].items():
        np.testing.assert_allclose(
            two["bundle"]["arrays"][name], arr, rtol=1e-6, atol=1e-7, err_msg=name
        )


def test_full_network_train_chars(spark):
    """Literal train-from-scratch parity: with train_chars=True the
    char Bi-LSTM + char embeddings move too, loss still decreases, and
    the char-trained model fits at least as well as the char-frozen
    one after the same epochs."""
    import numpy as np

    from neuroner_spark.model.train import train_full_network

    corpus = _corpus_in_domain(spark)
    vocab = build_vocab([r["token"] for r in corpus.select("token").collect()])
    bundle = make_bundle(vocab, seed=42)
    # momentum off: the char path multiplies effective gradient scale
    # (unique-word grads x occurrence counts) and momentum overshoots
    kw = dict(epochs=6, lr=1.0, momentum=0.0, patience=6, train_embeddings=True)
    frozen = train_full_network(spark, corpus, bundle, **kw)
    full = train_full_network(spark, corpus, bundle, train_chars=True, **kw)
    losses = [h["loss"] for h in full["history"]]
    assert losses[-1] < losses[0]
    for name in ("char_emb", "char_lstm_fw_W", "char_lstm_bw_U"):
        assert not np.array_equal(full["bundle"]["arrays"][name], bundle["arrays"][name]), name
        assert np.array_equal(frozen["bundle"]["arrays"][name], bundle["arrays"][name]), name
    # more trainable capacity must not fit WORSE on the train corpus
    assert losses[-1] <= frozen["history"][-1]["loss"] * 1.1
