"""Regenerate registry.py's cost_order list from a committed full-
registry sweep JSON (CORRECTNESS_LOCAL.json written by
SIM_PAR=1 SIM_JSON=... tools/verify_oracle.py).

Prints the formatted tuple body (cheapest first) ready to paste into
all_specs()'s cost_order, plus summary stats. Names present in the
registry but absent from the sweep (should not happen after a full
sweep) are reported loudly.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "CORRECTNESS_LOCAL.json"
    )
    with open(path) as f:
        sweep = json.load(f)
    from kafka_stream_job_spark.registry import all_specs

    specs = all_specs()
    missing = [n for n in specs if n not in sweep]
    if missing:
        print(f"MISSING from sweep ({len(missing)}): {missing}", file=sys.stderr)
        return 1
    ordered = sorted(specs, key=lambda n: (sweep[n].get("secs", 1e9), n))
    body = ", ".join(f'"{n}"' for n in ordered)
    print(
        textwrap.fill(
            body, width=76, initial_indent="        ", subsequent_indent="        "
        )
    )
    secs = [sweep[n].get("secs", 0) for n in ordered]
    print(
        f"\n# {len(ordered)} names; min {min(secs):.2f}s max {max(secs):.2f}s "
        f"total {sum(secs):.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
