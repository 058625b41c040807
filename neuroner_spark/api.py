"""User-facing API mirroring the reference's entry points (SURVEY §3).

Reference parity:
- entry point 1, ``src/neuroner.py :: fit`` (≈L200–330): ``fit`` runs
  full-network training driven by the reference's INI hyperparameters
  (learning_rate, maximum_number_of_epochs, patience,
  gradient_clipping_value) with per-epoch validation-F1 early stopping
  and per-epoch checkpoints.
- entry point 3, ``src/neuroner.py :: predict`` (≈L335–400): text in,
  list of {text, type, start, end} entity dicts out. Here ``predict``
  takes one text or a list and runs the full Spark path (normalize ->
  tokenize -> tag -> spans), so small-batch deploy and 10^12-page batch
  share one code path.
- entry point 2, pretrained evaluation: ``evaluate`` computes the
  conlleval phrase F1 of a tagged corpus against gold labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neuroner_spark.functions.normalize import normalize_whitespace
from neuroner_spark.functions.tokenize import tokenize
from neuroner_spark.model.tagger import tag_tokens
from neuroner_spark.operators.metrics import conlleval_f1
from neuroner_spark.operators.spans import extract_spans


def predict(spark: SparkSession, texts: str | list[str], bundle: dict, use_crf: bool = True) -> list[dict]:
    """Tag raw text(s) -> entity dicts (reference ``NeuroNER.predict``).

    Returns [{'doc': i, 'text': surface, 'type': T, 'start': s,
    'end': e}, ...] with char offsets into the normalized text.

    DRIVER-SIDE by design: this mirrors the reference's single-text
    ``n.predict(text)`` contract and collects the spans.  Do NOT loop
    it over a corpus — the distributed path for bulk tagging is
    ``plans.kg_pipeline.neural_mentions`` (or ``tag_tokens`` +
    ``extract_spans`` kept as DataFrames).
    """
    if isinstance(texts, str):
        texts = [texts]
    from neuroner_spark.io import local_df

    docs = local_df(
        spark, [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    ).select("doc_id", normalize_whitespace(F.col("text")).alias("text"))
    tokens = tokenize(docs)
    tagged = tag_tokens(spark, tokens, bundle, use_crf=use_crf)
    spans = extract_spans(tagged, label_col="label")
    out = []
    for r in spans.orderBy("doc_id", "sent_id", "start").collect():
        out.append(
            {
                "doc": int(r["doc_id"]),
                "text": r["surface"],
                "type": r["type"],
                "start": int(r["start"]),
                "end": int(r["end"]),
            }
        )
    return out


def evaluate(tagged_gold: DataFrame, gold_col: str = "gold", pred_col: str = "pred") -> DataFrame:
    """Pretrained-evaluation path: conlleval phrase F1 table."""
    return conlleval_f1(tagged_gold, gold_col, pred_col)


def fit(
    spark: SparkSession,
    train_tokens: DataFrame,
    bundle: dict,
    valid_tokens: DataFrame | None = None,
    config=None,
    checkpoint_dir: str | None = None,
    **overrides,
) -> dict:
    """Reference ``NeuroNER.fit``: train the full network on
    ``train_tokens(doc_id, sent_id, pos, token, label)``.

    Hyperparameters come from the reference's INI keys when a loaded
    ``EngineConfig`` is given (``learning_rate``,
    ``maximum_number_of_epochs``, ``patience``,
    ``gradient_clipping_value`` — CLI-style ``overrides`` win, exactly
    like ``main.py``).  With ``valid_tokens``, each epoch evaluates
    conlleval F1 on the validation split and early-stops on best F1
    (the reference's A8 criterion); otherwise patience is on train
    loss.  Returns {'bundle', 'history', 'best_epoch'}.
    """
    from neuroner_spark.model.train import train_full_network

    extra = dict(getattr(config, "extra", {}) or {})
    kw = {
        "epochs": int(extra.get("maximum_number_of_epochs", 100)),
        "lr": float(extra.get("learning_rate", 0.005)),
        "patience": int(extra.get("patience", 10)),
        "clip": float(extra.get("gradient_clipping_value", 5.0)),
        "optimizer": str(extra.get("optimizer", "sgd")),
        # the reference default is 0.5 — a config without the key must
        # not silently train without regularization
        "dropout": float(extra.get("dropout_rate", 0.5)),
        "seed": int(getattr(config, "seed", 42)),
    }
    if config is not None:
        # reference `use_crf` selects the training objective: CRF
        # log-likelihood (its default True) vs per-token softmax
        kw["loss"] = "crf" if getattr(config, "use_crf", True) else "softmax"
    kw.update(overrides)
    return train_full_network(
        spark,
        train_tokens,
        bundle,
        eval_tokens=valid_tokens,
        checkpoint_dir=checkpoint_dir,
        **kw,
    )
