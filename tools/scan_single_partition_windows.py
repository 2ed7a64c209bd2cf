"""One-off audit: list every registry query whose physical plan contains
a Window with an EMPTY partition spec (the single-partition-sort shape),
excluding the bounded `_pid`-ordered offset windows the _distributed
primitives emit. Feeds the allowlist in tests/test_plans.py."""
import sys, os, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from kafka_stream_job_spark.registry import all_specs

SF = os.environ.get("SIM_SF", "/root/testdata/sf0.001")
spark = SparkSession.builder.master("local[8]").appName("winscan").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")


def top_level_groups(s: str) -> list[str]:
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def empty_partition_windows(plan: str) -> list[str]:
    hits = []
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*()]*Window (\[.*)$", line)
        if not m:
            continue
        groups = top_level_groups(m.group(1))
        if len(groups) == 2:  # [exprs], [order] — no partition group
            if re.match(r"^_pid#\d+", groups[1].strip()):
                continue  # bounded |partitions|-row offsets window
            hits.append(line.strip()[:200])
    return hits


specs = all_specs()
only = sys.argv[1:] or None
for name, spec in specs.items():
    if only and name not in only:
        continue
    try:
        plan = spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERROR {exc}")
        continue
    hits = empty_partition_windows(plan)
    if hits:
        print(f"{name}: {len(hits)} empty-partition window(s)")
        for h in hits:
            print(f"    {h[:160]}")
print("done")
