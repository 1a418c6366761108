"""Metric analysis report — the reference's ``metrics/metric_analysis.ipynb``
re-expressed as a reproducible CLI (reference cells: phase-duration means,
DQ-funnel means, volume-scaling diff ratios, partition-strategy comparison,
worker-count trend).

Inputs are the artifacts this repo already produces:

- a run-metrics CSV directory written by ``append_run_metrics``
  (``pipeline/metrics.py`` — one flat record per batch, the reference's
  ``run_metrics`` dict), and/or
- JSONL files captured from ``tools/volume_bench.py`` /
  ``tools/partitioning_bench.py`` / ``tools/scale_bench.py`` /
  ``tools/daily_bench.py``.

Output is one markdown report (stdout or ``--out``). Metrics are
driver-side scalars — a few hundred rows at most — so this is plain
pandas, like the notebook, not a Spark job.

Usage::

    python tools/metric_report.py --runs /path/to/metrics_csv_dir \
        --volume volume.jsonl --partitioning part.jsonl --scale scale.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import pandas as pd

PHASE_COLS = [
    "duration_s_validation",
    "duration_s_merge",
    "duration_s_total",
]

DQ_COLS = [
    "n_total",
    "n_kept",
    "n_inserted",
    "n_closed",
    "n_stale",
    "n_null_key",
    "n_batch_date_mismatch",
    "n_duplicate_older",
]


def _load_runs_csv(path: str) -> pd.DataFrame:
    """Read a header'd CSV directory (or single file) of run metrics."""
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.csv")))
        frames = [pd.read_csv(p) for p in parts]
        if not frames:
            raise SystemExit(f"no CSV parts under {path}")
        df = pd.concat(frames, ignore_index=True)
    else:
        df = pd.read_csv(path)
    for c in df.columns:
        if c != "batch_id":
            df[c] = pd.to_numeric(df[c], errors="ignore")
    return df


def _load_jsonl(path: str) -> pd.DataFrame:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return pd.DataFrame(rows)


def _md_table(df: pd.DataFrame, floatfmt: int = 3) -> str:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(floatfmt)
    header = "| " + " | ".join(str(c) for c in df.columns) + " |"
    sep = "|" + "|".join("---" for _ in df.columns) + "|"
    body = [
        "| " + " | ".join("" if pd.isna(v) else str(v) for v in row) + " |"
        for row in df.itertuples(index=False)
    ]
    return "\n".join([header, sep, *body])


def section_runs(df: pd.DataFrame) -> str:
    """Phase-duration and DQ-funnel means (notebook cells 4-6)."""
    out = ["## Pipeline runs", ""]
    out.append(f"{len(df)} batch runs.")
    out.append("")
    phases = [c for c in df.columns if c.startswith("duration_s")]
    if phases:
        means = df[phases].mean().reset_index()
        means.columns = ["phase", "avg_time_s"]
        means["phase"] = means["phase"].str.replace("duration_s_", "", regex=False)
        out += ["### Average time per phase", "", _md_table(means), ""]
    dq = [c for c in DQ_COLS if c in df.columns]
    if dq:
        funnel = df[dq].mean().reset_index()
        funnel.columns = ["counter", "avg_per_batch"]
        out += ["### DQ funnel (mean per batch)", "", _md_table(funnel), ""]
    keep = ["batch_id", *phases, *[c for c in ("n_total", "n_kept", "n_inserted", "n_closed") if c in df.columns]]
    keep = [c for c in keep if c in df.columns]
    out += ["### Per-batch detail", "", _md_table(df[keep]), ""]
    return "\n".join(out)


def section_volume(df: pd.DataFrame) -> str:
    """Marginal cost per added row — the notebook's diff-ratio cell."""
    size_col = next((c for c in ("n_rows", "rows", "dataset_size") if c in df.columns), None)
    if size_col is None:
        return "## Volume scaling\n\n(unrecognized columns)\n"
    dur_col = next((c for c in ("total_s", "duration_s") if c in df.columns), None)
    if dur_col is None and {"load_s", "merge_s"} <= set(df.columns):
        df = df.assign(total_s=df["load_s"] + df["merge_s"])
        dur_col = "total_s"
    if dur_col is None:
        return "## Volume scaling\n\n(unrecognized columns)\n"
    df = df.sort_values(size_col).reset_index(drop=True)
    df["diff_rows"] = df[size_col].diff()
    df["diff_duration_s"] = df[dur_col].diff()
    df["marginal_us_per_row"] = 1e6 * df["diff_duration_s"] / df["diff_rows"]
    df["rows_per_s"] = (df[size_col] / df[dur_col]).round(0)
    cols = [size_col, dur_col, "rows_per_s", "diff_rows", "diff_duration_s", "marginal_us_per_row"]
    extra = [c for c in ("merge_s", "load_s") if c in df.columns]
    note = (
        "A flat (or falling) marginal cost per added row means the merge is "
        "O(batch), not O(table) — the property the reference's volume-scaling "
        "experiment checks."
    )
    return "\n".join(
        ["## Volume scaling", "", _md_table(df[extra + cols]), "", note, ""]
    )


def section_partitioning(df: pd.DataFrame) -> str:
    if not {"strategy", "duration_s"} <= set(df.columns):
        return "## Partitioning\n\n(unrecognized columns)\n"
    piv = (
        df.pivot_table(index="strategy", columns="query", values="duration_s", aggfunc="min")
        if "query" in df.columns
        else df.groupby("strategy")[["duration_s"]].min()
    )
    piv = piv.reset_index()
    return "\n".join(
        [
            "## Query duration by partition strategy",
            "",
            _md_table(piv),
            "",
            "Partition-pruned strategies should beat the unpartitioned scan on "
            "selective predicates (reference: partitioning_all_metrics_query_*.csv).",
            "",
        ]
    )


def section_scale(df: pd.DataFrame) -> str:
    axis = next((c for c in ("cpus", "workers_number", "workers") if c in df.columns), None)
    if axis is None:
        return "## Scaling\n\n(unrecognized columns)\n"
    df = df.sort_values(axis)
    num = [c for c in df.columns if c != axis and pd.api.types.is_numeric_dtype(df[c])]
    base = df.iloc[0]
    rows = []
    for _, r in df.iterrows():
        rec = {axis: r[axis]}
        for c in num[:6]:
            rec[c] = r[c]
        dur = next((c for c in ("total_s", "duration_s", "value") if c in df.columns), None)
        if dur and r[dur]:
            rec["speedup_vs_min"] = round(float(base[dur]) / float(r[dur]), 2)
        rows.append(rec)
    return "\n".join(
        [
            "## Scaling trend (parallelism axis)",
            "",
            _md_table(pd.DataFrame(rows)),
            "",
            "The reference ran this on 6→1 Azure workers; here the axis is "
            "local CPU count (tools/scale_bench.py), which exercises the same "
            "merge-dominated plateau.",
            "",
        ]
    )


def main(argv: list[str] | None = None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", help="run-metrics CSV directory (append_run_metrics output)")
    ap.add_argument("--volume", help="volume_bench JSONL")
    ap.add_argument("--partitioning", help="partitioning_bench JSONL")
    ap.add_argument("--scale", help="scale_bench JSONL")
    ap.add_argument("--out", help="write markdown here instead of stdout")
    args = ap.parse_args(argv)

    sections = ["# Metric analysis report", ""]
    if args.runs:
        sections.append(section_runs(_load_runs_csv(args.runs)))
    if args.volume:
        sections.append(section_volume(_load_jsonl(args.volume)))
    if args.partitioning:
        sections.append(section_partitioning(_load_jsonl(args.partitioning)))
    if args.scale:
        sections.append(section_scale(_load_jsonl(args.scale)))
    if len(sections) == 2:
        ap.error("nothing to report: pass at least one input")
    report = "\n".join(sections)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
    else:
        print(report)
    return report


if __name__ == "__main__":
    main()
