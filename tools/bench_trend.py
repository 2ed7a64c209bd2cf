"""Per-query bench trendline gate: compare the newest committed
BENCH_EXTENDED_r*.json (or BENCH_r*.json with --headline) against the
previous round on a HOST-NORMALIZED per-query basis and flag any query
slower than THRESHOLD x its prior time.

Normalization: each artifact carries a CPU calibration measurement
(cpu_calib_sec_before/after vs calib_ref_sec); a query's normalized
time is raw * calib_ref_sec / mean(calib). This is the same
normalization bench.py applies to its total, applied per query so the
flag fires on the query that regressed, not the round total.

Usage:
    python tools/bench_trend.py                # extended set, warn only
    python tools/bench_trend.py --strict       # exit 1 on any flag
    python tools/bench_trend.py --headline     # BENCH_r*.json instead

Soft by default (exit 0, WARN lines) — a loaded host inflates
everything and the normalization is approximate; --strict is for
pre-commit use on a quiet host.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = 1.5

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_of(path: str) -> int | None:
    """Driver-round number, or None for non-round artifacts (e.g.
    BENCH_*_rNN_entry.json snapshots) that the trend must skip."""
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else None


def _load(path: str) -> tuple[int, dict, float]:
    """(round_no, queries, normalization factor)."""
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)  # driver artifacts wrap under 'parsed'
    rnd = _round_of(path)
    calib = [
        parsed.get("cpu_calib_sec_before"),
        parsed.get("cpu_calib_sec_after"),
    ]
    calib = [c for c in calib if c]
    ref = parsed.get("calib_ref_sec")
    factor = (ref / (sum(calib) / len(calib))) if (calib and ref) else 1.0
    return rnd, parsed["queries"], factor


def main() -> int:
    strict = "--strict" in sys.argv
    pattern = "BENCH_r*.json" if "--headline" in sys.argv else "BENCH_EXTENDED_r*.json"
    paths = sorted(
        (
            p
            for p in glob.glob(os.path.join(ROOT, pattern))
            if _round_of(p) is not None
        ),
        key=_round_of,
    )
    if len(paths) < 2:
        print(f"need >=2 {pattern} artifacts for a trend; found {len(paths)}")
        return 0
    (r_prev, q_prev, f_prev), (r_new, q_new, f_new) = (
        _load(paths[-2]),
        _load(paths[-1]),
    )
    flags = []
    print(f"r{r_prev} -> r{r_new}  (normalization x{f_prev:.3f} -> x{f_new:.3f})")
    for name in sorted(q_new):
        if name not in q_prev:
            print(f"  NEW   {name}: {q_new[name]:.3f}s")
            continue
        a, b = q_prev[name] * f_prev, q_new[name] * f_new
        ratio = b / a if a else float("inf")
        mark = "WARN " if ratio > THRESHOLD else "ok   "
        if ratio > THRESHOLD:
            flags.append(name)
        print(f"  {mark}{name}: {a:.3f}s -> {b:.3f}s  ({ratio:.2f}x)")
    dropped = sorted(set(q_prev) - set(q_new))
    for name in dropped:
        print(f"  GONE  {name} (was {q_prev[name]:.3f}s)")
    if flags:
        print(
            f"\n{len(flags)} quer{'y' if len(flags) == 1 else 'ies'} over "
            f"{THRESHOLD}x normalized: {', '.join(flags)}"
        )
        return 1 if strict else 0
    print(f"\nno query over {THRESHOLD}x normalized")
    return 0


if __name__ == "__main__":
    sys.exit(main())
