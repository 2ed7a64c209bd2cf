"""The correctness gate, in-repo: every registered query with an oracle is
executed on Spark AND DuckDB at sf0.001 (fast) and compared the way the
driver compares (row count + schema + order-insensitive values). A second,
opt-in pass at sf0.01 (`KSJ_ORACLE_SF=sf0.01 pytest ...`) matches the
driver's exact scale."""

from __future__ import annotations

import os

import pytest

from kafka_stream_job_spark.registry import all_specs

from .conftest import SF_SMOKE, assert_matches_oracle

SF_DIR = os.environ.get("KSJ_ORACLE_SF_DIR", SF_SMOKE)

SPECS = all_specs()
ORACLE_SPECS = [s for s in SPECS.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in SPECS.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_query_matches_oracle(spark, spec):
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(spark, SF_DIR, df, spec.oracle, name=spec.name)


@pytest.mark.parametrize(
    "spec",
    ROWS_ONLY_SPECS or [None],
    ids=[s.name for s in ROWS_ONLY_SPECS] or ["none"],
)
def test_rows_only_queries_run(spark, spec):
    if spec is None:
        pytest.skip("no rows-only specs")
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)


def test_iln_spark_matches_model(spark):
    """Spark twin of test_properties.py::test_iln_oracle_sql_matches_reference:
    _attach_iln over an adversarial value set (exponent boundaries +/-1,
    LCG-scattered magnitudes, both int64 extremes) must equal the
    pure-Python rational model bit-for-bit — no libm anywhere."""
    from kafka_stream_job_spark.operators.text import _attach_iln, _iln_py

    ms = {1, 2, 3, (1 << 63) - 1}
    for e in (14, 15, 16, 40, 62):
        ms.update({(1 << e) - 1, 1 << e, (1 << e) + 1})
    x = 12345
    for _ in range(200):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        ms.add(x | 1)
    df = spark.createDataFrame([(m,) for m in sorted(ms)], "m long")
    got = {r["m"]: r["iln"] for r in _attach_iln(spark, df, "m", "iln").collect()}
    assert got == {m: _iln_py(m) for m in sorted(ms)}


def test_load_table_memoizes_per_session(spark):
    """The scan cache must hand back the same immutable plan within a
    session (per sf/table/rebalance) and never leak across sessions —
    keys carry the applicationId, so a stopped session's plans cannot be
    resurrected by a new one."""
    from kafka_stream_job_spark import tables
    from kafka_stream_job_spark.tables import load_table

    a = load_table(spark, SF_SMOKE, "nation")
    b = load_table(spark, SF_SMOKE, "nation")
    assert a is b, "same session+args must return the memoized plan"
    c = load_table(spark, SF_SMOKE, "nation", rebalance=True)
    assert c is not a, "rebalance variant is a distinct cache entry"
    d = load_table(spark, SF_SMOKE, "documents", rebalance=True, key="doc_id")
    e = load_table(spark, SF_SMOKE, "documents", rebalance=True)
    assert d is not e, "keyed rebalance variant is a distinct cache entry"
    import os

    app = spark.sparkContext.applicationId
    st = os.stat(os.path.join(SF_SMOKE, "nation.parquet"))
    assert (
        app,
        os.path.realpath(SF_SMOKE),
        "nation",
        False,
        None,
        st.st_mtime_ns,
        st.st_size,
    ) in tables._SCAN_CACHE, (
        "cache key must carry applicationId, the rebalance key, and the "
        "file's (mtime, size) so fixture regeneration invalidates the "
        "frozen file index"
    )
    std = os.stat(os.path.join(SF_SMOKE, "documents.parquet"))
    assert (
        app,
        os.path.realpath(SF_SMOKE),
        "documents",
        True,
        "doc_id",
        std.st_mtime_ns,
        std.st_size,
    ) in tables._SCAN_CACHE, "keyed rebalance entries carry key in the tuple"
    # correctness unaffected: the cached plan still scans fresh data
    assert a.count() == spark.read.parquet(f"{SF_SMOKE}/nation.parquet").count()


def test_span_corruption_no_phantom_spans(spark):
    """Regression for the round-9 fix: docs shorter than
    phase + SPAN_LEN must report ZERO spans. Before the fix, the
    trunc-toward-zero division turned a negative numerator into 0 and the
    +1 fabricated one span per short doc (overstating masked_tokens and
    corruption_bp for tokens that do not exist). Pin against a direct
    Python enumeration of the stride grid — not the SQL oracle, which
    shared the old bug."""
    from kafka_stream_job_spark.operators.pipeline import SPAN_LEN, SPAN_STRIDE

    rows = SPECS["span_corruption_manifest"].fn(spark, SF_DIR).collect()
    assert rows, "fixture documents table is empty"
    saw_short_doc = False
    for r in rows:
        starts = [
            s
            for s in range(r.phase, max(r.n_tokens - SPAN_LEN, -1) + 1, SPAN_STRIDE)
            if s + SPAN_LEN <= r.n_tokens
        ]
        assert r.n_spans == len(starts), (
            f"doc {r.doc_id}: n_spans={r.n_spans} but the stride grid has "
            f"{len(starts)} real spans (n_tokens={r.n_tokens}, phase={r.phase})"
        )
        assert r.masked_tokens == r.n_spans * SPAN_LEN
        if r.n_tokens < r.phase + SPAN_LEN:
            saw_short_doc = True
            assert r.n_spans == 0, (
                f"doc {r.doc_id} is shorter than phase+SPAN_LEN yet reports "
                f"{r.n_spans} phantom span(s)"
            )
    assert saw_short_doc, (
        "fixture no longer exercises the short-doc branch — regenerate or "
        "pick a doc set containing n_tokens < phase + SPAN_LEN"
    )
