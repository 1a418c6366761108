"""Corpus audit report — one command that tells you what is in a
document corpus before you train on it, composing the engine's
operators into a markdown dossier:

  * volume: docs, whitespace tokens, chars, per-source/language mix
  * quality: token-count quantiles, stopword/alpha ratios, Gopher
    repetition flags
  * duplication: exact-dup rate, duplicated-span fraction (Lee et al.
    window dedup), near-dup candidate rate (MinHash-LSH)
  * hygiene: PII hits (emails/phones)
  * monitors (the "evaluation as a query" family): per-source KL
    drift and length-distribution (shape) drift, ingest-volume
    anomalies, language-ID confusion, embedding health, ANN recall@5
    per nprobe plus the PQ recall rows

Usage::

    python tools/corpus_report.py /root/testdata/sf0.01 [--out report.md]

Every number is computed by the same operators the registry queries
use — the report is a composition, not a re-implementation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_report(spark, sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import dedup, text
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").persist()
    out = [f"# Corpus audit — {sf_dir}", ""]

    # volume ---------------------------------------------------------------
    vol = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count_ws(F.col("text"))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    ).collect()[0]
    out += [
        "## Volume",
        "",
        f"- documents: {vol['n_docs']:,}",
        f"- whitespace tokens: {int(vol['n_tokens']):,}",
        f"- characters: {int(vol['n_chars']):,}",
        "",
    ]
    mix = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .collect()
    )
    out += ["### Language mix", ""]
    out += [f"- {r['lang']}: {r['n']} ({100 * r['n'] / vol['n_docs']:.1f}%)" for r in mix]
    out.append("")

    # quality ---------------------------------------------------------------
    q = text.quality_features(docs)
    qq = q.agg(
        F.expr("percentile_approx(n_tokens, array(0.1, 0.5, 0.9))").alias("tok_q"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stop"),
        F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha"),
    ).collect()[0]
    rep = text.repetition_features(docs)
    n_repetitive = rep.filter(F.col("dup_word_frac") > 0.3).count()
    out += [
        "## Quality",
        "",
        f"- token count p10/p50/p90: {[int(x) for x in qq['tok_q']]}",
        f"- mean stopword ratio: {qq['avg_stop']}",
        f"- mean alpha ratio: {qq['avg_alpha']}",
        f"- Gopher-repetitive docs (dup_word_frac > 0.3): {n_repetitive}",
        "",
    ]

    # duplication ------------------------------------------------------------
    groups = dedup.exact_dedup(docs)
    dup_docs = groups.agg(
        F.sum(F.col("n_copies") - 1).alias("extra")
    ).collect()[0]["extra"]
    spans = dedup.duplicate_spans(docs, window=4)
    span_stats = spans.agg(
        F.round(
            F.sum("n_dup_windows") / F.greatest(F.sum("n_windows"), F.lit(1)), 4
        ).alias("dup_frac")
    ).collect()[0]
    sigs = dedup.minhash_signatures(docs)
    n_near = dedup.lsh_candidate_pairs(sigs).count()
    out += [
        "## Duplication",
        "",
        f"- exact duplicate docs (beyond first copy): {int(dup_docs)}"
        f" ({100 * dup_docs / vol['n_docs']:.2f}%)",
        f"- duplicated 4-token-span fraction: {span_stats['dup_frac']}",
        f"- MinHash-LSH near-dup candidate pairs: {n_near}",
        "",
    ]

    # hygiene ----------------------------------------------------------------
    pii = text.redact_pii(docs).agg(
        F.sum("n_emails").alias("emails"), F.sum("n_phones").alias("phones")
    ).collect()[0]
    out += [
        "## Hygiene",
        "",
        f"- email addresses: {int(pii['emails'])}",
        f"- phone-shaped digit runs: {int(pii['phones'])}",
        "",
    ]

    # monitors — every section IS a registry query (oracle-checked
    # elsewhere), composed here into the one user-facing artifact
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        release_tracked,
    )
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY

    def _q(name):
        df = REGISTRY[name].builder(spark, sf_dir)
        rows = df.collect()
        release_tracked()
        return rows

    out += ["## Monitors", ""]

    drift = sorted(
        _q("source_drift_kl"), key=lambda r: -r["kl_divergence"]
    )
    out += ["### Source drift (unigram KL vs corpus)", ""]
    out += [
        f"- {r['source']}: KL {r['kl_divergence']:.4f} ({int(r['n_tokens']):,} tokens)"
        for r in drift[:5]
    ]
    out.append("")

    ldrift = sorted(
        _q("source_length_drift"), key=lambda r: -r["l1_distance"]
    )
    out += ["### Source length-distribution drift (log2-histogram L1 vs corpus)", ""]
    out += [
        f"- {r['source']}: L1 {r['l1_distance']:.4f} ({int(r['n']):,} docs)"
        for r in ldrift[:5]
    ]
    out.append("")

    anom = _q("events_volume_anomaly")
    flagged = [r for r in anom if r["is_anomaly"]]
    out += [
        "### Ingest volume anomalies (per event_type/day z-score)",
        "",
        f"- days monitored: {len(anom)}; anomalous (|z| >= 2): {len(flagged)}",
    ]
    out += [
        f"- {r['event_type']} {r['day']}: n={r['n']} z={r['z']:.2f}"
        for r in sorted(flagged, key=lambda r: -abs(r["z"]))[:5]
    ]
    out.append("")

    conf = _q("text_lang_confusion")
    wrong = [r for r in conf if r["lang"] != r["lang_pred"]]
    n_pred = sum(r["n"] for r in conf)
    n_wrong = sum(r["n"] for r in wrong)
    out += [
        "### Language-ID confusion (heuristic vs table labels)",
        "",
        f"- labeled docs: {n_pred:,}; misclassified: {n_wrong:,}"
        f" ({100 * n_wrong / max(n_pred, 1):.1f}%)",
    ]
    out += [
        f"- {r['lang']} -> {r['lang_pred']}: {r['n']}"
        for r in sorted(wrong, key=lambda r: -r["n"])[:5]
    ]
    out.append("")

    health = _q("dq_embedding_health")
    out += ["### Embedding health (per label)", ""]
    out += [
        f"- {r['label']}: n={r['n']} wrong_dim={r['n_wrong_dim']}"
        f" zero_norm={r['n_zero_norm']} non_finite={r['n_nonfinite']}"
        for r in sorted(health, key=lambda r: str(r["label"]))
    ]
    out.append("")

    recall = _q("ann_recall_eval")
    by_np: dict[int, list[float]] = {}
    for r in recall:
        by_np.setdefault(int(r["nprobe"]), []).append(r["recall_at_5"])
    out += ["### ANN index selection (recall vs exact)", ""]
    out += [
        f"- IVF nprobe={np_}: mean recall@5 {sum(v) / len(v):.3f}"
        f" over {len(v)} queries"
        for np_, v in sorted(by_np.items())
    ]
    for name, label in (
        ("ann_pq_recall_eval", "PQ contract config (m=8 x k=16)"),
        ("ann_ivfpq_recall_eval", "IVF-PQ contract config (nprobe=3)"),
        ("ann_pq_adopted_recall_eval", "PQ ADOPTED config (m=32 x k=256)"),
        ("ann_ivfpq_adopted_recall_eval", "IVF-PQ adopted composition (nprobe=3)"),
    ):
        rows = _q(name)
        rec = [r["recall_at_10"] for r in rows]
        out.append(
            f"- {label}: mean recall@10 {sum(rec) / len(rec):.3f}"
            f" over {len(rec)} queries"
        )
    out.append("")

    # evaluations — the round-8 estimator/signal-quality queries
    dre = _q("dedup_recall_eval")[0]
    out += ["### Dedup blocker evaluation (MinHash-LSH vs exact Jaccard)", ""]
    out += [
        f"- true pairs (J>=0.8): {dre['n_truth']}; candidates:"
        f" {dre['n_candidates']}; surfaced: {dre['n_hits']}",
        f"- recall {dre['recall']}; candidate precision"
        f" {dre['candidate_precision']}",
        "",
    ]

    est = _q("dedup_estimate_eval")
    if est:
        mae = sum(r["abs_err"] for r in est) / len(est)
        me = sum(r["est_jaccard"] for r in est) / len(est)
        mx = sum(r["exact_jaccard"] for r in est) / len(est)
        out += [
            "### MinHash estimator calibration (candidate pairs)",
            "",
            f"- pairs: {len(est)}; MAE {mae:.3f}; mean estimate {me:.3f}"
            f" vs mean exact {mx:.3f}"
            + (
                " — signatures over-estimate; keep the exact verify stage"
                if me - mx > 0.05
                else ""
            ),
            "",
        ]

    zipf = _q("text_zipf_fit")[0]
    out += [
        "### Vocabulary shape (Zipf fit)",
        "",
        f"- vocab {zipf['vocab_size']}; slope {zipf['zipf_slope']}"
        f" (natural text ~ -1); r2 {zipf['r2']}"
        + (
            " — flat/non-power-law: template-like corpus"
            if zipf["zipf_slope"] is not None and zipf["zipf_slope"] > -0.5
            else ""
        ),
        "",
    ]

    div = sorted(
        _q("embed_diversity"),
        key=lambda r: r["mean_pairwise_cos"] or 0.0,
        reverse=True,
    )
    out += ["### Embedding diversity per label (mean pairwise cosine)", ""]
    out += [
        f"- label {r['label']}: {r['mean_pairwise_cos']} over {r['n']} vectors"
        for r in div[:5]
    ]
    out.append("")

    # mixture balance — group shares vs the 25% frequency cap
    # (mixture_group_cap) and shuffle-key skew (diag_key_skew)
    lang_counts = sorted(
        docs.groupBy("lang").count().collect(), key=lambda r: -r["count"]
    )
    n_total = sum(r["count"] for r in lang_counts)
    # count() only — never collect the corpus-sized survivor set
    n_capped = REGISTRY["mixture_group_cap"].builder(spark, sf_dir).count()
    release_tracked()
    trimmed = n_total - n_capped
    out += ["### Mixture balance (25% per-language cap)", ""]
    out += [
        f"- {r['lang']}: {r['count']:,} docs"
        f" ({100 * r['count'] / n_total:.1f}%)"
        + (" — OVER CAP, trimmed" if r["count"] / n_total > 0.25 else "")
        for r in lang_counts
    ]
    out += [
        f"- cap outcome: {n_capped:,} of {n_total:,} docs survive"
        f" ({trimmed:,} trimmed)",
        "",
    ]

    skew = _q("diag_key_skew")
    out += [
        "### Shuffle-key skew pre-flight (events.user_id)",
        "",
        f"- heaviest key: {skew[0]['user_id']}"
        f" ({skew[0]['n']} rows, {skew[0]['skew_ratio']:.2f}x mean)"
        if skew
        else "- no keys",
        f"- top-10 keys hold {100 * sum(r['share'] for r in skew):.2f}%"
        f" of rows",
        "",
    ]

    docs.unpersist()
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    from delta_lake_pyspark_scd2_spark.session import get_spark

    report = build_report(get_spark("corpus_report"), args.sf_dir)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
    else:
        print(report)


if __name__ == "__main__":
    main()
