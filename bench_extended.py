"""Extended benchmark: the operator families added AFTER the r01
headline set froze — real image decoders (PNG/GIF/BMP + aHash), the
magic-byte sniffer, rank statistics (Spearman), Haar wavelet energy,
mutual information, label propagation, winnowing exact-substring dedup,
the frontier Bloom, distributed logistic-regression training, and three
stateful streaming twins (IVF assign, OHLC bars, LSH candidate buckets).

Same machinery and JSON shape as bench.py (warmup pass, min-of-two
timed passes, loadavg + cpu-calibration evidence, host-normalized
total) so BENCH_EXTENDED_r*.json trends are comparable across rounds
exactly like BENCH_r*.json — a perf regression in the new families is
visible here before the driver ever benches them.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extended.py
"""

from __future__ import annotations

import sys

from bench import run_bench


def main() -> None:
    run_bench(
        lambda s: s.bench_ext,
        "extended_queries_total_time",
        app_name="kafka-stream-job-spark-bench-extended",
    )


if __name__ == "__main__":
    sys.exit(main())
