#!/usr/bin/env python
"""Scaling-curve gate (r10 brief #2 / r11 brief #1).

Three modes:

  python tools/scaling_curve.py
      Ratio table from the committed dual-SF sweeps
      (CORRECTNESS_LOCAL.json @ sf0.01, CORRECTNESS_LOCAL_SF01.json @
      sf0.1): per-query time(sf0.1)/time(sf0.01) for the 10x data step,
      flagging ratios above --flag (default 12). Writes
      SCALING_CURVE.md unless --no-write.

  python tools/scaling_curve.py --generate K OUTDIR [--src SFDIR]
      Build a synthetic scale-up of the documents and events tables by
      deterministic K-fold replication with key shifts (doc_id/user_id/
      event_id strides far above real key ranges; replica text gets a
      per-replica suffix token so n-gram volume actually grows).
      Dimension/fact tables the flagged queries don't touch (region ..
      lineitem, embeddings) are hard-linked/copied from --src (default
      /root/testdata/sf0.1) unchanged — this tool targets the
      documents/events-family tail; the relational queries already have
      dual-SF evidence in the committed sweeps.

  python tools/scaling_curve.py --measure q1 [q2 ...] --dirs d1 [d2 ...]
      Time the SPARK side only (registry fn -> noop sink materialize,
      best of --passes runs) for each query at each data dir, and print
      per-step time ratios next to the data-size ratios. The DuckDB
      oracle is deliberately excluded: the gate measures the engine's
      scaling shape, and correctness at these SFs is covered by the
      sweeps.

The pass/fail intuition: a query is scale-clean when its time ratio for
a Kx data step stays within ~2x of K once absolute times are large
enough that fixed overhead (session, planning, sub-second noise) no
longer dominates.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DOC_ID_STRIDE = 100_000_000
USER_ID_STRIDE = 100_000_000
EVENT_ID_STRIDE = 10_000_000_000

COPY_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "embeddings",
)


def ratio_table(flag: float, write: bool) -> int:
    lo = json.load(open(REPO / "CORRECTNESS_LOCAL.json"))
    hi = json.load(open(REPO / "CORRECTNESS_LOCAL_SF01.json"))
    rows = []
    for name, r_lo in lo.items():
        r_hi = hi.get(name)
        if not r_hi or "secs" not in r_lo or "secs" not in r_hi:
            continue
        rows.append((name, r_lo["secs"], r_hi["secs"],
                     r_hi["secs"] / max(r_lo["secs"], 1e-9)))
    rows.sort(key=lambda t: -t[3])
    flagged = [r for r in rows if r[3] > flag and r[1] > 0.3]
    noise = [r for r in rows if r[3] > flag and r[1] <= 0.3]
    lines = [
        "# SCALING_CURVE — 10x data step (sf0.01 -> sf0.1), committed sweeps",
        "",
        f"{len(rows)} queries with timings in both sweeps; "
        f"flag threshold ratio > {flag} with sf0.01 time > 0.3 s "
        f"({len(flagged)} flagged, {len(noise)} above threshold but "
        "sub-0.3s at sf0.01 where fixed overhead dominates).",
        "",
        "| query | sf0.01 s | sf0.1 s | ratio |",
        "|---|---|---|---|",
    ]
    for name, a, b, r in rows[:40]:
        mark = " **FLAG**" if (name, a, b, r) in flagged else ""
        lines.append(f"| {name}{mark} | {a:.2f} | {b:.2f} | {r:.1f}x |")
    med = sorted(r[3] for r in rows if r[1] > 0.3)
    if med:
        lines += ["", f"Median ratio (sf0.01 > 0.3 s): "
                      f"{med[len(med) // 2]:.2f}x for 10x data."]
    out = "\n".join(lines)
    print(out)
    if write:
        (REPO / "SCALING_CURVE.md").write_text(out + "\n")
        print("\nwrote SCALING_CURVE.md", file=sys.stderr)
    return 0


def generate(k: int, outdir: str, src: str) -> int:
    from pyspark.sql import functions as F

    from kafka_stream_job_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for t in COPY_TABLES:
        s, d = os.path.join(src, f"{t}.parquet"), os.path.join(
            outdir, f"{t}.parquet")
        if not os.path.exists(d):
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
    rep = spark.range(k).select(F.col("id").alias("_rep"))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    scaled_docs = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_rep") * DOC_ID_STRIDE).alias("doc_id"),
            # replica 0 keeps the original text; later replicas append a
            # deterministic per-doc token so shingle/bigram volume grows
            # with the data instead of collapsing onto the replica-0 set
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" qq"), F.col("_rep"),
                    F.lit("x"), F.col("doc_id") % 997,
                )
            )
            .alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    scaled_docs.write.mode("overwrite").parquet(
        os.path.join(outdir, "documents.parquet"))

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    scaled_ev = ev.crossJoin(rep).select(
        (F.col("event_id") + F.col("_rep") * EVENT_ID_STRIDE).alias(
            "event_id"),
        "ts",
        (F.col("user_id") + F.col("_rep") * USER_ID_STRIDE).alias("user_id"),
        "event_type", "value", "props",
    )
    scaled_ev.write.mode("overwrite").parquet(
        os.path.join(outdir, "events.parquet"))
    nd = spark.read.parquet(os.path.join(outdir, "documents.parquet")).count()
    ne = spark.read.parquet(os.path.join(outdir, "events.parquet")).count()
    print(f"generated {outdir}: documents={nd} events={ne} (k={k})")
    return 0


def measure(queries: list[str], dirs: list[str], passes: int) -> int:
    from kafka_stream_job_spark.registry import all_specs
    from kafka_stream_job_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    missing = [q for q in queries if q not in specs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    # Data size = documents+events ROW counts (both scale exactly K-fold
    # under --generate; compressed parquet BYTES understate replicated
    # data by 2-3x and would overstate every time ratio).
    import pyarrow.dataset as pads

    sizes = []
    for d in dirs:
        sizes.append(sum(
            pads.dataset(os.path.join(d, f"{t}.parquet")).count_rows()
            for t in ("documents", "events")
        ))
    report: dict[str, dict] = {}
    for q in queries:
        fn = specs[q].fn
        times = []
        for d in dirs:
            best = None
            for _ in range(passes):
                t0 = time.monotonic()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
        steps = []
        for i in range(1, len(dirs)):
            data_x = sizes[i] / max(sizes[i - 1], 1)
            time_x = times[i] / max(times[i - 1], 1e-9)
            steps.append({"data_x": round(data_x, 2),
                          "time_x": round(time_x, 2)})
        report[q] = {"secs": [round(t, 3) for t in times], "steps": steps}
        step_s = "  ".join(
            f"{s['time_x']}x time / {s['data_x']}x data" for s in steps)
        print(f"{q}: {[round(t, 2) for t in times]} s   {step_s}",
              flush=True)
    print(json.dumps({"dirs": dirs, "rows": sizes, "queries": report}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", type=float, default=12.0)
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument("--generate", nargs=2, metavar=("K", "OUTDIR"))
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--measure", nargs="+", metavar="QUERY")
    ap.add_argument("--dirs", nargs="+")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    if args.generate:
        return generate(int(args.generate[0]), args.generate[1], args.src)
    if args.measure:
        if not args.dirs:
            ap.error("--measure requires --dirs")
        return measure(args.measure, args.dirs, args.passes)
    return ratio_table(args.flag, not args.no_write)


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    raise SystemExit(main())
