"""Round-7 stage isolation: time each sub-stage of the expensive bench
legs with the noop sink (guide §1.4) so optimization targets the right
operator.  NOT part of the frozen bench contract — measurement only.

Usage: python scripts/bench_stages_r07.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "bench_stages_r07",
        cores=cpus,
        shuffle_partitions=max(int(cpus), 8) if cpus != "*" else 32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    # warm python workers
    import pandas as _pd

    n_workers = 32 if cpus == "*" else int(cpus)
    spark.range(n_workers * 2).repartition(n_workers * 2).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [1]}) for _ in it), "x int"
    ).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, repeats=3):
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        print(f"{name:40s} best={min(samples):7.3f} samples={[round(s,3) for s in samples]}")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    from neuroner_spark.functions.tokenize import tokenize
    from neuroner_spark.operators.gazetteer import match_mentions, ngram_candidates
    from neuroner_spark.operators.linking import link_mentions
    from neuroner_spark.plans.catalog_kg import _aliases
    from neuroner_spark.plans.kg_pipeline import canonical_map, triples_from_linked

    aliases = _aliases(spark)
    d = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("text"),
    )

    spark.sparkContext.setJobDescription("kg: tokenize only")
    timed("kg.tokenize", lambda: noop(tokenize(d.withColumnRenamed("url", "doc_id"))))

    tokens = tokenize(d.withColumnRenamed("url", "doc_id"))
    spark.sparkContext.setJobDescription("kg: ngram_candidates")
    anchors = aliases.select(
        F.element_at(F.split(F.col("alias_norm"), " "), 1).alias("first_word")
    ).distinct()
    timed("kg.ngram_candidates", lambda: noop(ngram_candidates(tokens, 3, anchor_words=anchors)))
    spark.sparkContext.setJobDescription("kg: match_mentions")
    timed("kg.match_mentions", lambda: noop(match_mentions(tokens, aliases)))
    mentions = match_mentions(tokens, aliases)
    spark.sparkContext.setJobDescription("kg: link_mentions")
    timed("kg.link", lambda: noop(link_mentions(mentions, aliases, use_fuzzy=False)))
    linked = link_mentions(mentions, aliases, use_fuzzy=False)
    spark.sparkContext.setJobDescription("kg: canonical_map")
    timed("kg.canonical_map", lambda: canonical_map(aliases).count())
    canon = canonical_map(aliases)
    spark.sparkContext.setJobDescription("kg: triples")
    timed("kg.triples_from_linked", lambda: triples_from_linked(linked, canon, d).count())

    # --- neural tagger decomposition
    from neuroner_spark.model.tagger import sentences_from_tokens, tag_tokens
    from neuroner_spark.model.weights import make_bundle

    bundle = make_bundle(1 << 16, seed=42)
    toks2 = tokenize(docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text"))
    spark.sparkContext.setJobDescription("tagger: sentences")
    timed("tagger.sentences", lambda: noop(sentences_from_tokens(toks2)))
    spark.sparkContext.setJobDescription("tagger: full")
    timed("tagger.full", lambda: tag_tokens(spark, toks2, bundle).count())

    # --- dedup_jaccard decomposition
    from neuroner_spark.operators.dedup import shingles, simhash

    spark.sparkContext.setJobDescription("jaccard: shingles")
    timed("jaccard.shingles", lambda: noop(shingles(docs, 3)))
    from neuroner_spark.plans.catalog_text import q_dedup_jaccard, q_simhash

    spark.sparkContext.setJobDescription("jaccard: full")
    timed("jaccard.full", lambda: q_dedup_jaccard(spark, sf_dir).count())

    # --- simhash decomposition
    spark.sparkContext.setJobDescription("simhash: signatures only")
    timed("simhash.signatures", lambda: noop(simhash(docs, bits=32)))
    spark.sparkContext.setJobDescription("simhash: full query")
    timed("simhash.full", lambda: q_simhash(spark, sf_dir).count())

    # --- conlleval decomposition
    from neuroner_spark.plans.catalog_ner import pseudo_tokens, q_conlleval_f1
    from neuroner_spark.operators.spans import extract_spans

    spark.sparkContext.setJobDescription("conlleval: pseudo_tokens")
    timed("conlleval.pseudo_tokens", lambda: noop(pseudo_tokens(spark, sf_dir)))
    spark.sparkContext.setJobDescription("conlleval: extract_spans gold")
    timed(
        "conlleval.spans_gold",
        lambda: noop(extract_spans(pseudo_tokens(spark, sf_dir), label_col="gold")),
    )
    spark.sparkContext.setJobDescription("conlleval: full")
    timed("conlleval.full", lambda: q_conlleval_f1(spark, sf_dir).count())

    from neuroner_spark.plans.catalog_text import q_minhash_signatures

    spark.sparkContext.setJobDescription("minhash: full")
    timed("minhash.full", lambda: q_minhash_signatures(spark, sf_dir).count())


if __name__ == "__main__":
    main()
