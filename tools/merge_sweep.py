"""Merge a partial verify_oracle SIM_JSON into a committed sweep file.

Behavior changes re-earn their row immediately after the change (subset
run), without rerunning the full registry per commit; the full sweep is
still refreshed end-of-round. Usage:

    python tools/merge_sweep.py partial.json CORRECTNESS_LOCAL.json
"""
import json
import sys

partial, target = sys.argv[1], sys.argv[2]
with open(partial) as fh:
    p = json.load(fh)
with open(target) as fh:
    t = json.load(fh)
bad = [n for n, r in p.items() if not r.get("hash_match")]
if bad:
    sys.exit(f"refusing to merge non-green rows: {bad}")
t.update(p)
with open(target, "w") as fh:
    json.dump(t, fh, indent=1)
print(f"merged {len(p)} row(s) into {target}")
