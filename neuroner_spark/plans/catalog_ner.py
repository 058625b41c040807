"""Oracle-checked NER-operator catalog (SURVEY.md W2/W3/W4, A3–A6, P5).

The driver's DuckDB harness only registers the star-schema tables, so
we derive a deterministic pseudo-labeled token corpus from
``documents`` (rule-based gold + a perturbed pred) and run the REAL
engine operators (``functions.tags``, ``operators.spans``,
``operators.metrics``) over it, with a CTE-for-CTE SQL oracle.  This
proves the production operator code — not a reimplementation — against
an independent engine.

Gold rule (pinned, order matters):
  'table scan' / 'hash join' / 'merge sort' -> B-OP I-OP bigrams
  'spark' -> B-TECH;  'window' -> B-FN;  else O
Pred rule (perturbed for non-trivial metrics):
  drops the 'merge sort' bigram (FNs), adds 'stream' -> B-TECH (FPs),
  tags 'window' as B-TECH (type confusions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neuroner_spark.functions.tags import bioes_to_bio, with_bioes
from neuroner_spark.operators.metrics import (
    confusion_matrix,
    conlleval_f1,
    token_accuracy,
    token_prf,
)
from neuroner_spark.operators.spans import extract_spans

BIGRAMS = [("table", "scan"), ("hash", "join"), ("merge", "sort")]
PRED_BIGRAMS = [("table", "scan"), ("hash", "join")]  # 'merge sort' dropped


def _label_rule(tok, prv, nxt, bigrams, tech_tokens, fn_as="B-FN"):
    # .when chains and SQL CASE are both first-match-wins; keep the
    # case order identical on both sides.
    cases = []
    for first, second in bigrams:
        cases.append(((tok == first) & (nxt == second), F.lit("B-OP")))
        cases.append(((tok == second) & (prv == first), F.lit("I-OP")))
    for t in tech_tokens:
        cases.append((tok == t, F.lit("B-TECH")))
    cases.append((tok == "window", F.lit(fn_as)))
    out = None
    for cond, val in cases:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(F.lit("O"))


def pseudo_tokens(spark, sf_dir) -> DataFrame:
    """documents -> (doc_id, sent_id, pos, token, start, end, gold, pred)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    ).withColumn("sent_id", F.lit(0).cast("long"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    tok, prv, nxt = F.col("token"), F.lag("token").over(w), F.lead("token").over(w)
    return toks.select(
        "doc_id",
        "sent_id",
        "pos",
        "token",
        F.col("pos").cast("long").alias("start"),
        (F.col("pos") + 1).cast("long").alias("end"),
        _label_rule(tok, prv, nxt, BIGRAMS, ["spark"], "B-FN").alias("gold"),
        _label_rule(tok, prv, nxt, PRED_BIGRAMS, ["spark", "stream"], "B-TECH").alias("pred"),
    )


# Shared SQL CTE mirroring pseudo_tokens (0-based pos).
def _rule_sql(bigrams, tech_tokens, fn_as):
    lines = []
    for first, second in bigrams:
        lines.append(f"WHEN token = '{first}' AND nxt = '{second}' THEN 'B-OP'")
        lines.append(f"WHEN token = '{second}' AND prv = '{first}' THEN 'I-OP'")
    for t in tech_tokens:
        lines.append(f"WHEN token = '{t}' THEN 'B-TECH'")
    lines.append(f"WHEN token = 'window' THEN '{fn_as}'")
    return "CASE " + " ".join(lines) + " ELSE 'O' END"


PSEUDO_TOKENS_CTE = f"""
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(0 AS BIGINT) AS sent_id,
         CAST(pos - 1 AS INT) AS pos, token
  FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
  )
), labeled AS (
  SELECT doc_id, sent_id, pos, token,
         CAST(pos AS BIGINT) AS start, CAST(pos + 1 AS BIGINT) AS "end",
         {_rule_sql(BIGRAMS, ["spark"], "B-FN")} AS gold,
         {_rule_sql(PRED_BIGRAMS, ["spark", "stream"], "B-TECH")} AS pred
  FROM (
    SELECT doc_id, sent_id, pos, token,
           lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prv,
           lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
  )
)
"""


# conlleval chunk-start sessionization in SQL (mirrors operators/spans.py)
def _spans_cte(label_col: str, out: str) -> str:
    return f"""
{out}_flag AS (
  SELECT doc_id, sent_id, pos, token, start, "end",
         CASE WHEN {label_col} = 'O' THEN 'O' ELSE substring({label_col}, 1, 1) END AS pfx,
         regexp_replace({label_col}, '^[BIOES]-', '') AS typ,
         {label_col} AS lab,
         lag({label_col}) OVER (PARTITION BY doc_id, sent_id ORDER BY pos) AS prv
  FROM labeled
), {out}_started AS (
  SELECT *,
         CASE WHEN lab = 'O' THEN 0
              WHEN pfx IN ('B', 'S') THEN 1
              WHEN pfx IN ('I', 'E') AND NOT (prv IS NOT NULL AND (prv = 'B-' || typ OR prv = 'I-' || typ)) THEN 1
              ELSE 0 END AS starts
  FROM {out}_flag
), {out}_sess AS (
  SELECT *,
         sum(starts) OVER (PARTITION BY doc_id, sent_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM {out}_started
), {out} AS (
  SELECT doc_id, sent_id, span_id,
         first(typ ORDER BY pos) AS type,
         min(start) AS start, max("end") AS "end",
         string_agg(token, ' ' ORDER BY pos) AS surface,
         count(*) AS n_tokens
  FROM {out}_sess WHERE lab <> 'O'
  GROUP BY doc_id, sent_id, span_id
)
"""


def q_ner_labels(spark, sf_dir):
    return pseudo_tokens(spark, sf_dir).select("doc_id", "pos", "token", "gold", "pred")


SQL_NER_LABELS = f"""
WITH {PSEUDO_TOKENS_CTE}
SELECT doc_id, pos, token, gold, pred FROM labeled
"""


def q_bio_to_bioes(spark, sf_dir):
    """W2 (BIO->BIOES) per token, PLUS the W3 round-trip back column
    (r5 tag-merge: ``bioes_roundtrip`` folded in under the driver's
    50-query budget — W2∘W3=id is now hash-checked row-wise via
    ``gold_back``, a strictly stronger check than the old joint
    distribution)."""
    toks = with_bioes(pseudo_tokens(spark, sf_dir), "gold", "gold_bioes")
    back = toks.withColumn("gold_back", bioes_to_bio(F.col("gold_bioes")))
    return back.select("doc_id", "pos", "token", "gold", "gold_bioes", "gold_back")


SQL_BIO_TO_BIOES = f"""
WITH {PSEUDO_TOKENS_CTE},
bioes AS (
  SELECT doc_id, pos, token, gold,
         CASE WHEN gold = 'O' THEN 'O'
              WHEN gold LIKE 'B-%' AND nxt_gold = 'I-' || regexp_replace(gold, '^[BIOES]-', '') THEN gold
              WHEN gold LIKE 'B-%' THEN 'S-' || regexp_replace(gold, '^[BIOES]-', '')
              WHEN gold LIKE 'I-%' AND nxt_gold = 'I-' || regexp_replace(gold, '^[BIOES]-', '') THEN gold
              WHEN gold LIKE 'I-%' THEN 'E-' || regexp_replace(gold, '^[BIOES]-', '')
              ELSE gold END AS gold_bioes
  FROM (
    SELECT doc_id, pos, token, gold,
           lead(gold) OVER (PARTITION BY doc_id, sent_id ORDER BY pos) AS nxt_gold
    FROM labeled
  )
)
SELECT doc_id, pos, token, gold, gold_bioes,
       CASE WHEN gold_bioes LIKE 'S-%' THEN 'B-' || substring(gold_bioes, 3)
            WHEN gold_bioes LIKE 'E-%' THEN 'I-' || substring(gold_bioes, 3)
            ELSE gold_bioes END AS gold_back
FROM bioes
"""


def q_extract_spans(spark, sf_dir):
    spans = extract_spans(pseudo_tokens(spark, sf_dir), label_col="gold")
    return spans.select("doc_id", "type", "start", "end", "surface", "n_tokens")


SQL_EXTRACT_SPANS = f"""
WITH {PSEUDO_TOKENS_CTE},
{_spans_cte("gold", "gspans")}
SELECT doc_id, type, start, "end" AS "end", surface, n_tokens FROM gspans
"""


def q_conlleval_f1(spark, sf_dir):
    return conlleval_f1(pseudo_tokens(spark, sf_dir), "gold", "pred")


SQL_CONLLEVAL_F1 = f"""
WITH {PSEUDO_TOKENS_CTE},
{_spans_cte("gold", "gspans")},
{_spans_cte("pred", "pspans")},
matched AS (
  SELECT coalesce(g.type, p.type) AS type,
         CASE WHEN g.doc_id IS NOT NULL AND p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_tp,
         CASE WHEN g.doc_id IS NULL AND p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_fp,
         CASE WHEN g.doc_id IS NOT NULL AND p.doc_id IS NULL THEN 1 ELSE 0 END AS is_fn
  FROM gspans g FULL OUTER JOIN pspans p
    ON g.doc_id = p.doc_id AND g.sent_id = p.sent_id
   AND g.start = p.start AND g."end" = p."end" AND g.type = p.type
), counts AS (
  SELECT type, CAST(sum(is_tp) AS BIGINT) AS tp, CAST(sum(is_fp) AS BIGINT) AS fp,
         CAST(sum(is_fn) AS BIGINT) AS fn
  FROM matched GROUP BY type
  UNION ALL
  SELECT 'ALL' AS type, CAST(sum(is_tp) AS BIGINT), CAST(sum(is_fp) AS BIGINT),
         CAST(sum(is_fn) AS BIGINT)
  FROM matched
)
SELECT type, tp, fp, fn,
       round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
       round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                     + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END) > 0
             THEN 2 * (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                    * (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END)
                  / ((CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                   + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END))
             ELSE 0.0 END, 6) AS f1
FROM counts
"""


def q_ner_confusion(spark, sf_dir):
    return confusion_matrix(pseudo_tokens(spark, sf_dir), "gold", "pred")


SQL_NER_CONFUSION = f"""
WITH {PSEUDO_TOKENS_CTE}
SELECT gold, pred, count(*) AS n FROM labeled GROUP BY gold, pred
"""


def q_token_prf(spark, sf_dir):
    """A4 with BOTH eval modes tagged in one frame: 'token' (prefix
    stripped) and 'binary' (i2b2-deid style ENT vs O)."""
    toks = pseudo_tokens(spark, sf_dir)
    t = token_prf(toks, "gold", "pred", mode="token").withColumn("mode", F.lit("token"))
    b = token_prf(toks, "gold", "pred", mode="binary").withColumn("mode", F.lit("binary"))
    return t.unionByName(b)


def _prf_ctes(remap_gold: str, remap_pred: str, sfx: str) -> str:
    return f"""
remapped{sfx} AS (
  SELECT {remap_gold} AS gold, {remap_pred} AS pred FROM labeled
), conf{sfx} AS (
  SELECT gold, pred, count(*) AS n FROM remapped{sfx} GROUP BY gold, pred
), as_gold{sfx} AS (
  SELECT gold AS cls,
         sum(CASE WHEN pred = gold THEN n ELSE 0 END) AS tp,
         sum(CASE WHEN pred <> gold THEN n ELSE 0 END) AS fn
  FROM conf{sfx} GROUP BY gold
), as_pred{sfx} AS (
  SELECT pred AS cls, sum(CASE WHEN gold <> pred THEN n ELSE 0 END) AS fp
  FROM conf{sfx} GROUP BY pred
), per_cls{sfx} AS (
  SELECT coalesce(g.cls, p.cls) AS cls,
         CAST(coalesce(tp, 0) AS BIGINT) AS tp,
         CAST(coalesce(fp, 0) AS BIGINT) AS fp,
         CAST(coalesce(fn, 0) AS BIGINT) AS fn
  FROM as_gold{sfx} g FULL OUTER JOIN as_pred{sfx} p ON g.cls = p.cls
  WHERE coalesce(g.cls, p.cls) <> 'O'
)"""


_PRF_MEASURES = """cls, tp, fp, fn,
       round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
       round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                     + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END) > 0
             THEN 2 * (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                    * (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END)
                  / ((CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END)
                   + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END))
             ELSE 0.0 END, 6) AS f1"""


SQL_TOKEN_PRF = f"""
WITH {PSEUDO_TOKENS_CTE},
{_prf_ctes("regexp_replace(gold, '^[BIOES]-', '')", "regexp_replace(pred, '^[BIOES]-', '')", "_t")},
{_prf_ctes("CASE WHEN gold = 'O' THEN 'O' ELSE 'ENT' END", "CASE WHEN pred = 'O' THEN 'O' ELSE 'ENT' END", "_b")}
SELECT {_PRF_MEASURES}, 'token' AS mode FROM per_cls_t
UNION ALL
SELECT {_PRF_MEASURES}, 'binary' AS mode FROM per_cls_b
"""


def q_token_accuracy(spark, sf_dir):
    """A6 + A7 tagged into one scalar frame (metric, value) — merged
    per the <=50-entry driver budget: token accuracy over the pseudo
    corpus and the char-padding probe (max token length / token count)
    over the documents corpus."""
    from pyspark.sql import functions as F

    acc = token_accuracy(pseudo_tokens(spark, sf_dir), "gold", "pred")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    a7 = toks.agg(
        F.max(F.length("token")).cast("double").alias("max_tok_len"),
        F.count("*").cast("double").alias("doc_n_tokens"),
    )
    return (
        acc.select(F.lit("token_accuracy").alias("metric"), F.col("accuracy").cast("double").alias("value"))
        .unionByName(acc.select(F.lit("ner_n_tokens").alias("metric"), F.col("n_tokens").cast("double").alias("value")))
        .unionByName(a7.select(F.lit("max_tok_len").alias("metric"), F.col("max_tok_len").alias("value")))
        .unionByName(a7.select(F.lit("doc_n_tokens").alias("metric"), F.col("doc_n_tokens").alias("value")))
    )


SQL_TOKEN_ACCURACY = f"""
WITH {PSEUDO_TOKENS_CTE},
acc AS (
  SELECT round(avg(CASE WHEN gold = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
         count(*) AS n_tokens
  FROM labeled
), a7 AS (
  SELECT CAST(max(length(token)) AS DOUBLE) AS max_tok_len,
         CAST(count(*) AS DOUBLE) AS doc_n_tokens
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
)
SELECT 'token_accuracy' AS metric, accuracy AS value FROM acc
UNION ALL
SELECT 'ner_n_tokens', CAST(n_tokens AS DOUBLE) FROM acc
UNION ALL
SELECT 'max_tok_len', max_tok_len FROM a7
UNION ALL
SELECT 'doc_n_tokens', doc_n_tokens FROM a7
"""


QUERIES = {
    "ner_labels": (q_ner_labels, SQL_NER_LABELS),
    "bio_to_bioes": (q_bio_to_bioes, SQL_BIO_TO_BIOES),
    # bioes_roundtrip folded into bio_to_bioes (r5 tag-merge): the
    # gold_back column hash-checks W2∘W3=id row-wise.
    "extract_spans": (q_extract_spans, SQL_EXTRACT_SPANS),
    "conlleval_f1": (q_conlleval_f1, SQL_CONLLEVAL_F1),
    "ner_confusion": (q_ner_confusion, SQL_NER_CONFUSION),
    "token_prf": (q_token_prf, SQL_TOKEN_PRF),
    "token_accuracy": (q_token_accuracy, SQL_TOKEN_ACCURACY),
}
