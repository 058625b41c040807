"""Distant-supervision round trip: gazetteer-labeled tokens train the
BiLSTM-CRF, and the TRAINED neural pipeline's triples are scored
against the gazetteer pipeline's triples — the north rule's
"P/R vs the reference pipeline's emitted triples" shape, produced
end-to-end at corpus scale with no hand labels.

Stages:
  1. fixture pages -> tokenize -> gazetteer mentions -> BIOES ORG
     pseudo-labels (distant supervision)
  2. train_full_network on the pseudo-labeled corpus
  3. run the NEURAL kg pipeline (mention_source='neural') on a
     replicate-xN corpus; run the GAZETTEER pipeline on the same
  4. report triple P/R of neural vs gazetteer

Usage: python scripts/distant_supervision_demo.py [n_pages] [replicate]
       [epochs] [epochs2]
``epochs2`` (default 0) adds a fine-tune stage at lr=0.1 after the
main lr=0.5 stage — full-batch momentum descent oscillates near the
optimum, and a triple needs BOTH its mentions found (pair-level recall
is mention recall SQUARED), so the last recall points need the small
steps. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    epochs2 = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from pyspark.sql import functions as F

    from neuroner_spark.fixtures.gen import alias_df, pages_df
    from neuroner_spark.functions.tokenize import tokenize
    from neuroner_spark.model.train import train_full_network
    from neuroner_spark.model.weights import build_vocab, make_bundle
    from neuroner_spark.operators.gazetteer import match_mentions
    from neuroner_spark.plans.kg_pipeline import normalize_pages, run_pipeline
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "distant_supervision",
        cores="32",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    aliases = alias_df(spark)
    pages = pages_df(spark, n_pages)
    tokens = tokenize(normalize_pages(pages))

    # 1. distant supervision: gazetteer hits -> BIOES pseudo-labels
    mentions = match_mentions(tokens, aliases)
    tagged = mentions.select(
        "doc_id",
        "sent_id",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("_i"),
        (F.col("pos")).alias("_mpos"),
        "n",
    ).select(
        "doc_id",
        "sent_id",
        (F.col("_mpos") + F.col("_i")).alias("pos"),
        F.when(F.col("n") == 1, F.lit("S-ORG"))
        .when(F.col("_i") == 0, F.lit("B-ORG"))
        .when(F.col("_i") == F.col("n") - 1, F.lit("E-ORG"))
        .otherwise(F.lit("I-ORG"))
        .alias("_lab"),
    )
    labeled = (
        tokens.join(tagged, ["doc_id", "sent_id", "pos"], "left")
        .select(
            "doc_id",
            "sent_id",
            "pos",
            "token",
            F.coalesce("_lab", F.lit("O")).alias("label"),
        )
    )

    # 2. train
    vocab = build_vocab([r["token"] for r in tokens.select("token").distinct().collect()])
    bundle = make_bundle(vocab, seed=42)
    t0 = time.time()
    # momentum 0.9: full-batch-per-epoch descent stalls in the all-O
    # basin without it (class imbalance: ~90% O tokens)
    # loss='crf': the softmax objective learns the frequent in-span
    # tokens but never the B->E span structure (and decode applies CRF
    # transitions the training never touched) — with the exact CRF
    # log-likelihood the predicted spans match the alias surfaces
    res = train_full_network(
        spark, labeled, bundle, epochs=epochs, lr=0.5, momentum=0.9,
        patience=epochs, train_embeddings=True, loss="crf",
    )
    trained = res["bundle"]
    if epochs2:
        res = train_full_network(
            spark, labeled, trained, epochs=epochs2, lr=0.1, momentum=0.9,
            patience=epochs2, train_embeddings=True, loss="crf",
        )
        trained = res["bundle"]
    train_s = time.time() - t0
    # diagnostic: does the trained tagger emit spans at all?
    from neuroner_spark.plans.kg_pipeline import neural_mentions

    n_pred_mentions = neural_mentions(spark, tokens, trained).count()
    n_gaz_mentions = mentions.count()

    # 3. both pipelines on the replicate-xN corpus
    reps = [pages.withColumn("url", F.concat(F.lit(f"r{i}_"), F.col("url"))) for i in range(replicate)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.repartition(32).localCheckpoint()
    for d in ("/tmp/ds_neural", "/tmp/ds_gaz"):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    neural = run_pipeline(
        spark, big, aliases, "/tmp/ds_neural", resume=False,
        mention_source="neural", bundle=trained,
    )
    n_triples = neural["triples"].select("subj", "pred", "obj", "url").distinct()
    n_count = n_triples.count()
    neural_s = time.time() - t0
    gaz = run_pipeline(spark, big, aliases, "/tmp/ds_gaz", resume=False)
    g_triples = gaz["triples"].select("subj", "pred", "obj", "url").distinct()
    g_count = g_triples.count()

    # 4. P/R of neural vs gazetteer triples
    inter = n_triples.join(g_triples, ["subj", "pred", "obj", "url"], "left_semi").count()
    precision = inter / n_count if n_count else 0.0
    recall = inter / g_count if g_count else 0.0
    print(
        json.dumps(
            {
                "n_pages_train": n_pages,
                "n_pages_eval": n_pages * replicate,
                "epochs": epochs,
                "train_wall_s": round(train_s, 1),
                "final_train_loss": res["history"][-1]["loss"],
                "pred_mentions_train_pages": n_pred_mentions,
                "gaz_mentions_train_pages": n_gaz_mentions,
                "neural_pipeline_wall_s": round(neural_s, 1),
                "neural_triples": n_count,
                "gazetteer_triples": g_count,
                "triples_in_both": inter,
                "precision_vs_gazetteer": round(precision, 4),
                "recall_vs_gazetteer": round(recall, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
