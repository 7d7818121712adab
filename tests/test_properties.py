"""Property-based coverage (SURVEY.md §5.2.4, hypothesis):

1. Regex fast/slow equivalence: for patterns drawn from the Java-safe
   grammar, the native `rlike` fast path must agree with Python `re`
   (the slow-path semantics) on arbitrary path strings — this is the
   invariant the X1 classifier stakes its correctness on.
2. Upsert idempotency: applying the same update batch twice is a no-op
   (the reference's retryMaxAttempts=10 redelivery safety,
   reactor.py:208) for arbitrary key/version collision shapes.

Spark actions are expensive per-example, so example counts are small and
deadlines disabled; each example is a tiny createDataFrame + collect.
"""

from __future__ import annotations

import os
import re
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipelinejobs_indexer_spark.functions.udfs import (  # noqa: E402
    is_java_safe,
    regex_any_filter,
)
from pipelinejobs_indexer_spark.plans.upsert import latest_wins  # noqa: E402

# --- strategy: patterns from a deliberately Java-safe regex grammar -----

_literal = st.text(alphabet="abcxyz019", min_size=1, max_size=4)
_charclass = st.sampled_from([r"[a-z]", r"[0-9]", r"[a-z0-9]", r"\d", r"\w", r"\."])
_atom = st.one_of(_literal.map(re.escape), _charclass)
_quant = st.sampled_from(["", "*", "+", "?", "{1,2}"])
_piece = st.tuples(_atom, _quant).map(lambda t: t[0] + t[1])
_branch = st.lists(_piece, min_size=1, max_size=3).map("".join)
_pattern = st.builds(
    lambda branches, anchor_start, anchor_end: (
        ("^" if anchor_start else "")
        + "|".join(branches)
        + ("$" if anchor_end and len(branches) == 1 else "")
    ),
    st.lists(_branch, min_size=1, max_size=2),
    st.booleans(),
    st.booleans(),
)

_paths = st.lists(
    st.text(alphabet="abcxyz019./_-", min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pattern=_pattern, paths=_paths)
def test_rlike_fast_path_matches_python_re(spark, pattern, paths):
    assert is_java_safe(pattern), pattern
    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    got = sorted(
        r.path
        # newline_free: the path alphabet above has no newline, so the
        # property also exercises the endswith lowering branch
        for r in df.filter(
            regex_any_filter(F.col("path"), [pattern], newline_free=True)
        ).collect()
    )
    want = sorted(p for p in paths if re.search(pattern, p))
    assert got == want, f"pattern={pattern!r} paths={paths!r}"


# --- strategy: upsert batches with arbitrary key overlap ----------------

_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=3),  # version
        st.sampled_from(["CREATED", "RUNNING", "FINISHED"]),
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=_docs, new_rows=_docs)
def test_latest_wins_idempotent_and_correct(spark, old_rows, new_rows):
    schema = "uuid int, version int, state string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    once = latest_wins(old, new, key=["uuid"], version="version")
    twice = latest_wins(once, new, key=["uuid"], version="version")
    got_once = {(r.uuid, r.version, r.state) for r in once.collect()}
    got_twice = {(r.uuid, r.version, r.state) for r in twice.collect()}
    assert got_once == got_twice, "second application of the same batch changed rows"
    # model check: per key, max (version, src, insertion-order-free state)
    # ties between old and new at equal version go to new; within a side,
    # ties resolve by the max struct — model with the same rule on state.
    model: dict[int, tuple] = {}
    for src, rows in ((0, old_rows), (1, new_rows)):
        for k, v, s in rows:
            cur = model.get(k)
            cand = (v, src, s)
            if cur is None or cand > cur:
                model[k] = cand
    want = {(k, v, s) for k, (v, _src, s) in model.items()}
    assert got_once == want


def test_sample_rate_monotonicity(spark):
    """Hash-threshold sampling is subset-monotone: for ANY rate pair
    r1 <= r2, the r1 sample is a subset of the r2 sample — the property
    that makes deterministic downsampling safely composable."""
    from pyspark.sql import functions as F

    from pipelinejobs_indexer_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bucket = F.expr(
        "cast(conv(substr(md5(concat('sample:', cast(doc_id as string))), 1, 15),"
        " 16, 10) as bigint) % 1000"
    )
    with_b = docs.select("doc_id", bucket.alias("b"))
    kept = {
        rate: {r.doc_id for r in with_b.filter(F.col("b") < rate).collect()}
        for rate in (100, 400, 800, 1000)
    }
    assert kept[100] <= kept[400] <= kept[800] <= kept[1000]
    assert len(kept[1000]) == docs.count()


def test_normalization_idempotent(spark):
    """norm(norm(x)) == norm(x): the C4 normalization must be a
    projection onto its own fixed points, or dedup hashes would depend on
    how many times a pipeline normalized."""
    from pyspark.sql import functions as F

    from pipelinejobs_indexer_spark.llm.dedup import norm_expr

    rows = [
        ("Hello,   World!",),
        ("  multiple   spaces\tand TABS  ",),
        ("MiXeD-case_with.punct!!",),
        ("",),
        ("already normalized text",),
        ("éàü non-ascii stripped",),
    ]
    df = spark.createDataFrame(rows, "text string").select(
        norm_expr().alias("once")
    )
    twice = df.select(F.col("once").alias("text")).select(norm_expr().alias("twice"))
    assert [r.once for r in df.collect()] == [r.twice for r in twice.collect()]


def test_observation_metrics_ride_the_curation_pass(spark):
    """df.observe(): production metrics (rows kept, mean score) computed
    DURING the curation action — no second pass over the data. The
    monitoring hook a real 100 TB pipeline attaches to every stage."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pipelinejobs_indexer_spark.llm.text import llm_corpus_curate_full

    obs = Observation("curate")
    out = llm_corpus_curate_full(spark, "/root/testdata/sf0.001").observe(
        obs, F.count(F.lit(1)).alias("rows_kept"), F.avg("score").alias("mean_score")
    )
    n = out.count()
    assert obs.get["rows_kept"] == n > 0
    assert 0.3 <= obs.get["mean_score"] <= 1.0
