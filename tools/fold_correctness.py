#!/usr/bin/env python
"""Fold CORRECTNESS_r*.json driver rows into registry._DRIVER_EARNED.

Recomputes the full earned-round ledger from every committed
CORRECTNESS_r*.json (latest green round per name) and rewrites the
``_DRIVER_EARNED`` dict block inside ``kafka_stream_job_spark/registry.py``
in place. Run it as the first commit of each round, after the driver drops
the new CORRECTNESS file:

    python tools/fold_correctness.py          # rewrite registry.py
    python tools/fold_correctness.py --check  # exit 1 if registry is stale

A row is green when rows/schema/hash all matched with no error, or — for
the registry's no-oracle entries — when the rows-only check produced a row
count without error (err == "no_oracle").
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REGISTRY = REPO / "kafka_stream_job_spark" / "registry.py"


def earned_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        for name, row in json.load(open(f)).items():
            # Fully green only: rows AND schema AND value hash (a
            # rows-match-but-hash-mismatch row is a VALUE bug and must
            # not count as verified — CORRECTNESS_r01 contains such
            # rows); the two no-oracle entries earn rows-only green.
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def render_block(last: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for n, r in last.items():
        by_round.setdefault(r, []).append(n)
    out: list[str] = []
    for r in sorted(by_round):
        names = sorted(by_round[r])
        out.append(
            f"    # last driver-green row earned in round {r}"
            f" ({len(names)} names)"
        )
        line = "    "
        for n in names:
            tok = f'"{n}": {r}, '
            if len(line) + len(tok) > 78:
                out.append(line.rstrip())
                line = "    "
            line += tok
        out.append(line.rstrip())
    return "\n".join(out)


def main() -> int:
    check = "--check" in sys.argv
    src = REGISTRY.read_text()
    m = re.search(
        r"(_DRIVER_EARNED: dict\[str, int\] = \{\n)(.*?)(\n\}\n)",
        src,
        re.DOTALL,
    )
    if not m:
        print("could not locate _DRIVER_EARNED block in registry.py")
        return 2
    new_block = render_block(earned_rounds())
    if m.group(2) == new_block:
        print(f"registry ledger up to date ({new_block.count(':')} entries)")
        return 0
    if check:
        print("registry ledger is STALE — run tools/fold_correctness.py")
        return 1
    REGISTRY.write_text(src[: m.start(2)] + new_block + src[m.end(2):])
    print("rewrote _DRIVER_EARNED ledger")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
