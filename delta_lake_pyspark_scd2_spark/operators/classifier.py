"""Trained quality classifier: distributed logistic regression over
hashed text features — the fasttext-style quality-filter pattern
(pretrain pipelines train a cheap linear model on weak labels, then
score the whole corpus).

Scale design — iterative ML as plain DataFrame aggregations:

* Each gradient-descent iteration is ONE aggregation job over the
  corpus: the per-row gradient ``(σ(w·x) − y)·x`` is a higher-order
  array expression (JVM-side, no UDF), and the ``dim+1`` component
  sums ride a single map-side-combined agg — so an iteration's cost is
  one scan + one tiny shuffle, and the driver holds only the
  ``dim+1``-float weight vector between iterations.
* Weights re-enter the plan as broadcast literals each round
  (``array(lit(...))``) — nothing driver-side ever scales with rows.
* Feature vectors come from
  :func:`operators.text.hashed_tfidf_embedding` (corpus statistics
  only), so the whole train+score path needs no external model
  artifact.

Scoring is :func:`predict`: a narrow per-row dot product.
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_up(x: float, dp: int) -> float:
    """Half-AWAY-FROM-ZERO rounding, matching Spark ``F.round`` and
    DuckDB ``round`` — Python's built-in ``round`` is half-to-even, so
    an exact .5 tie at the last kept decimal would diverge from the
    engine-side rounding the oracle contract chains on (round-9
    advice: latent, tie never hit on the current corpus — fixed
    anyway because weight updates chain iteration-to-iteration)."""
    q = decimal.Decimal(1).scaleb(-dp)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _dot(vec_col: Column, weights: list[float], bias: float) -> Column:
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec_col, w, lambda x, wi: x * wi),
        F.lit(float(bias)),
        lambda acc, v: acc + v,
    )


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _prob(vec_col: Column, weights: list[float], bias: float,
          round_dp: int | None) -> Column:
    """σ(w·x + b), optionally with the cross-engine rounding discipline:
    the logit is rounded BEFORE the sigmoid and the probability AFTER,
    so float-order drift between engines (fold order of the dot
    product, libm exp ulps) is absorbed at each nonlinearity boundary —
    the same 6-dp contract the unrolled-Lloyd k-means oracle uses."""
    z = _dot(vec_col, weights, bias)
    if round_dp is None:
        return _sigmoid(z)
    return F.round(_sigmoid(F.round(z, round_dp)), round_dp)


def train_logreg(
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
    *,
    dim: int,
    iters: int = 15,
    lr: float = 0.5,
    l2: float = 1e-4,
    round_dp: int | None = None,
) -> dict:
    """Batch gradient descent; returns ``{"weights", "bias", "loss"}``
    (loss = per-iteration mean log-loss history, computed in the SAME
    aggregation as the gradient — one job per iteration, not two).

    ``round_dp`` enables the oracle-chaining discipline: per-row
    probabilities, summed gradients, and each updated weight/bias are
    rounded to ``round_dp`` decimals every iteration, so an unrolled
    SQL replica of the training loop (DuckDB CTEs) chains bit-identical
    weight literals — the trick that made the k-means training in
    ``dedup_semantic`` value-hash-provable."""
    n = df.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * dim
    b = 0.0
    losses: list[float] = []
    for _ in range(iters):
        # materialize p/err ONCE per row in a projection — Catalyst does
        # not CSE across aggregate expressions, so referencing the w·x
        # fold inside dim+2 sums would re-evaluate it dim+2 times per row
        x = F.col(feature_col)
        y = F.col(label_col).cast("double")
        proj = df.select(
            x.alias("_x"),
            y.alias("_y"),
            _prob(x, w, b, round_dp).alias("_p"),
        ).withColumn("_err", F.col("_p") - F.col("_y"))
        p, yv, err = F.col("_p"), F.col("_y"), F.col("_err")
        row = proj.agg(
            *[
                F.sum(err * F.element_at(F.col("_x"), j + 1)).alias(f"g{j}")
                for j in range(dim)
            ],
            F.sum(err).alias("gb"),
            F.sum(
                -(
                    yv * F.log(F.greatest(p, F.lit(1e-12)))
                    + (F.lit(1.0) - yv)
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                )
            ).alias("loss"),
        ).collect()[0]
        losses.append(_round_half_up(float(row["loss"]) / n, 6))
        if round_dp is None:
            w = [
                wi - lr * (float(row[f"g{j}"]) / n + l2 * wi)
                for j, wi in enumerate(w)
            ]
            b -= lr * float(row["gb"]) / n
        else:
            # round the SUMMED gradients first (absorbs engine float-
            # order drift), then the updated parameters (what the next
            # iteration's plan literals — and the oracle's next CTE —
            # actually chain on); half-up, same tie-breaking as
            # F.round/DuckDB
            w = [
                _round_half_up(
                    wi
                    - lr
                    * (_round_half_up(float(row[f"g{j}"]), round_dp) / n + l2 * wi),
                    round_dp,
                )
                for j, wi in enumerate(w)
            ]
            b = _round_half_up(
                b - lr * _round_half_up(float(row["gb"]), round_dp) / n, round_dp
            )
    return {"weights": w, "bias": b, "loss": losses}


def predict(
    df: DataFrame,
    model: dict,
    feature_col: str = "embedding",
    score_col: str = "score",
    round_dp: int | None = None,
) -> DataFrame:
    """Score rows with a trained model — narrow per-row dot product.
    ``round_dp`` applies the same logit-then-probability rounding the
    oracle-chained trainer uses (scores stay 6-dp either way)."""
    x = F.col(feature_col)
    if round_dp is None:
        p = _sigmoid(_dot(x, model["weights"], model["bias"]))
        return df.withColumn(score_col, F.round(p, 6))
    return df.withColumn(
        score_col, _prob(x, model["weights"], model["bias"], round_dp)
    )


def sample_predicate(id_col: str, frac: float) -> Column:
    """Deterministic content-hash sample predicate: the shared md5
    hash primitive as a uniform draw in [0, 1) — same engine-portable
    family as ``plans.relational.sample_hash``. The same rows are
    selected on any cluster size, partitioning, or run."""
    from delta_lake_pyspark_scd2_spark.functions.hashing import uniform_draw

    return uniform_draw(F.col(id_col)) < F.lit(float(frac))


def exact_discrete_median(
    df: DataFrame, value_col: Column, *, alias: str = "__L"
) -> int:
    """Exact discrete median by the explicit rank rule *smallest value
    whose cumulative count reaches ceil(n/2)* — engine-portable (the
    identical rule is spelled out in the oracle SQL), unlike
    ``percentile_approx`` whose GK-sketch tie-breaking is Spark-
    internal. Plan shape: one groupBy compresses the corpus to the
    distinct-value table (bounded by the value domain — document
    lengths here), then one cumulative window over that bounded table."""
    from pyspark.sql import Window

    lens = df.select(value_col.alias(alias))
    n = lens.count()
    if n == 0:
        raise ValueError("empty frame — median undefined")
    target = (n + 1) // 2
    # global-window-ok: input is the distinct-length table, bounded by
    # the max document length (domain-sized, not corpus-sized)
    w = Window.orderBy(alias).rowsBetween(Window.unboundedPreceding, 0)
    byl = df.groupBy(value_col.alias(alias)).count()
    return int(
        byl.withColumn("__cum", F.sum("count").over(w))
        .filter(F.col("__cum") >= F.lit(target))
        .agg(F.min(alias))
        .collect()[0][0]
    )


def quality_filter_scores(
    docs: DataFrame,
    *,
    dim: int = 32,
    iters: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    label: Column | None = None,
    sample_frac: float | None = None,
    round_dp: int | None = 6,
) -> DataFrame:
    """End-to-end weak-label quality classifier: hashed TF-IDF features
    → logistic regression → per-doc quality score.

    Default weak label: document length above the corpus median — the
    classic bootstrap where a crude heuristic supervises a model that
    generalizes beyond it (here: onto token CONTENT via the hashed
    features). Returns (id, label, score, pred).

    ``sample_frac`` is the 100 TB shape: train on a deterministic
    hash-sample (each GD iteration then scans only the sample), score
    EVERYTHING — batch GD's per-iteration full-corpus cost drops to
    sample size while the output still covers every document."""
    from delta_lake_pyspark_scd2_spark.operators.text import (
        hashed_tfidf_embedding,
        token_count_ws,
    )

    emb = hashed_tfidf_embedding(docs, text_col, id_col, dim=dim, dense=True)
    if label is None:
        med = exact_discrete_median(docs, F.length(text_col))
        lab = docs.select(
            F.col(id_col),
            (F.length(text_col) > F.lit(med)).cast("int").alias("label"),
        )
    else:
        lab = docs.select(F.col(id_col), label.cast("int").alias("label"))
    full = emb.join(lab, id_col)
    if sample_frac is not None and sample_frac < 1.0:
        train = full.filter(sample_predicate(id_col, sample_frac)).persist()
        score_set = full
    else:
        train = full.persist()
        score_set = train
    try:
        model = train_logreg(train, dim=dim, iters=iters, round_dp=round_dp)
        scored = predict(score_set, model, round_dp=round_dp)
    finally:
        train.unpersist()
    return scored.select(
        id_col,
        "label",
        "score",
        (F.col("score") > 0.5).cast("int").alias("pred"),
    )


def auc(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tie-aware ROC-AUC (Mann-Whitney U over rank statistics) as a
    fully distributed plan — the model-eval half a quality-classifier
    pipeline needs next to :func:`train_logreg`/:func:`predict`.

    Ranks ascend by score via
    :func:`~delta_lake_pyspark_scd2_spark.operators.ranking
    .distributed_total_rank` (range-bucketed — no single-task global
    sort), tied scores take their group's average rank (a window over
    the score partition: one shuffle on the score key), and

        AUC = (Σ avg-rank(positives) − n₊(n₊+1)/2) / (n₊ · n₋)

    Exactness note: a tie group's average of consecutive integer ranks
    is always a multiple of 0.5, exactly representable — so the sums
    are order-independent and the 6-dp rounding is engine-stable.
    Returns one row ``(n_pos, n_neg, auc)``; ``auc`` is NULL when a
    class is empty (undefined, not 0).
    """
    from pyspark.sql import Window

    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
    )

    ranked = distributed_total_rank(
        df.select(id_col, score_col, label_col),
        score_col,
        [id_col],
        descending=False,
    )
    avgr = ranked.withColumn(
        "__ar", F.avg("__rank").over(Window.partitionBy(score_col))
    )
    y = F.col(label_col).cast("int")
    agg = avgr.agg(
        F.sum(F.when(y == 1, F.col("__ar"))).alias("__sr"),
        F.sum(F.when(y == 1, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(y == 0, 1).otherwise(0)).cast("long").alias("n_neg"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (np_ > 0) & (nn > 0),
            F.round(
                (F.col("__sr") - np_ * (np_ + F.lit(1)) / F.lit(2.0))
                / (np_ * nn),
                6,
            ),
        ).alias("auc"),
    )
