"""Distributed text classification for training-data curation: a
multinomial Naive Bayes classifier TRAINED on the cluster with nothing but
relational aggregation — the quality/language classifier every corpus
pipeline needs, expressed so both phases scale to 100 TB:

- **Training** is two map-side-combinable groupBys (per-(label, token)
  counts and per-label totals) — one bounded shuffle each; no gradient
  loop, no driver-side model state. The model IS a DataFrame.
- **Scoring** explodes the candidate docs' tokens, joins the model on
  (label, token) — a plain shuffle hash join that AQE/broadcast handles by
  size — and sums log-likelihoods per (doc, label); the argmax is one
  window. Every step is built-in JVM expressions.

Determinism device (the repo-wide cross-engine policy): log-likelihoods
are scaled to micro-log integers — ``round(ln(p) · 1e6)`` as BIGINT — so
per-document scores are exact integer sums, immune to float summation
order across engines and partitionings. Ties argmax-break on label
ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: log-likelihood scale: micro-logs (6 dp) — fine enough that rounding
#: never flips a real argmax, coarse enough that libm last-ulp noise
#: can't move a rounded value
LL_SCALE = 1_000_000


def _micro_log(col) -> F.Column:
    return F.round(F.log(col) * LL_SCALE).cast("bigint")


def nb_train(
    train: DataFrame, text_col: str = "text", label_col: str = "label"
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-1 smoothing over whitespace tokens.

    Returns ``(model, labels)``:
      model  — (label, token, ll_s): scaled log P(token | label)
      labels — (label, prior_s, default_ll_s): scaled log prior and the
               smoothed log-likelihood for tokens UNSEEN in that label's
               training slice (count 0 → 1/(n_tok + |V|))

    The vocabulary size joins in as a broadcast 1-row aggregate, keeping
    the whole build declarative — no driver-side scalars.

    Scan accounting (the corpus is the expensive thing): the token
    stream is exploded ONCE into the (label, token) count grid, which is
    pinned (localCheckpoint — it is model-sized, |labels|·|vocab| rows,
    the artifact a real trainer would persist anyway); per-label token
    totals and the vocabulary size are then derived from the GRID, and
    the doc-level priors cost one more (cheap, no-explode) pass — two
    corpus scans total instead of one per aggregate."""
    lbl, txt = F.col(label_col), F.col(text_col)
    toks = train.select(lbl.alias("label"), F.explode(F.split(txt, " ")).alias("token"))
    counts = toks.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    n_lang = counts.groupBy("label").agg(F.sum("cnt").alias("n_tok"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    model = (
        counts.join(F.broadcast(n_lang), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "token",
            _micro_log((F.col("cnt") + 1.0) / (F.col("n_tok") + F.col("v"))).alias(
                "ll_s"
            ),
        )
    )
    n_docs = train.groupBy(lbl.alias("label")).agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = n_docs.agg(F.sum("n_docs").alias("n_total"))
    labels = (
        n_lang.join(F.broadcast(n_docs), "label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_total))
        .select(
            "label",
            _micro_log(F.col("n_docs") / F.col("n_total")).alias("prior_s"),
            _micro_log(F.lit(1.0) / (F.col("n_tok") + F.col("v"))).alias(
                "default_ll_s"
            ),
        )
    )
    return model, labels


def nb_score(
    test: DataFrame,
    model: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each doc against every label and keep the argmax. Returns
    (id_col, pred_label, score_s). The candidate fan-out is |labels|
    (small — broadcast); the model join is keyed (label, token) and left-
    outer so out-of-vocabulary tokens fall back to the label's smoothed
    default. Scores are exact integers → argmax is engine- and
    partitioning-independent (ties break label-ascending)."""
    # explode_outer: a NULL-text doc keeps one (token=NULL) row, so it
    # still receives a prediction (the prior-only argmax — the correct
    # NB answer for an empty document) instead of silently vanishing
    toks = test.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.split(F.col(text_col), " ")).alias("token"),
    )
    cand = toks.crossJoin(F.broadcast(labels))
    scored = cand.join(model, ["label", "token"], "left").select(
        "_id",
        "label",
        "prior_s",
        # NULL token = no tokens at all: contributes ZERO likelihood
        # (not a phantom OOV default)
        F.when(F.col("token").isNull(), F.lit(0))
        .otherwise(F.coalesce("ll_s", "default_ll_s"))
        .alias("ll_s"),
    )
    doc_scores = scored.groupBy("_id", "label", "prior_s").agg(
        F.sum("ll_s").alias("_sum_ll")
    )
    w = Window.partitionBy("_id").orderBy(
        (F.col("prior_s") + F.col("_sum_ll")).desc(), F.col("label").asc()
    )
    return (
        doc_scores.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred_label"),
            (F.col("prior_s") + F.col("_sum_ll")).alias("score_s"),
        )
    )
