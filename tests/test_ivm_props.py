"""Property-based IVM-aggregate semantics: random insert/delete batches
vs a dict model (hypothesis). Maintenance must equal a from-scratch
recompute of (base + inserts - deletes) for ANY delta, including
group-dropping deletes and brand-new groups — the same executable-model
strategy as the writer/CDC/SCD2 property suites."""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from forklift_spark.patterns import ivm_agg_apply

GROUPS = list("abcd")

rows = st.lists(
    st.tuples(st.sampled_from(GROUPS), st.integers(min_value=-50, max_value=50)),
    max_size=12,
)


@st.composite
def scenario(draw):
    base = draw(rows)
    inserts = draw(rows)
    # deletes must be rows the view absorbed: a sub-multiset of base+inserts
    pool = base + inserts
    idx = draw(
        st.lists(
            st.integers(min_value=0, max_value=max(len(pool) - 1, 0)),
            max_size=len(pool),
            unique=True,
        )
    ) if pool else []
    deletes = [pool[i] for i in idx]
    return base, inserts, deletes


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario())
def test_ivm_agg_matches_recompute(spark, sc):
    base, inserts, deletes = sc

    def df(data):
        return spark.createDataFrame(data or [("zz", 0)], "g string, v long").filter(
            "g <> 'zz'" if not data else "1=1"
        )

    view_old = spark.createDataFrame(
        [(g, n, s) for g, (n, s) in _model(base).items()] or [("zz", 0, 0)],
        "g string, n_rows long, sum_v long",
    ).filter("g <> 'zz'" if not base else "1=1")
    out = ivm_agg_apply(
        view_old, df(inserts), df(deletes), keys=["g"], sum_cols={"sum_v": "v"}
    )
    got = {r.g: (r.n_rows, r.sum_v) for r in out.collect()}
    effective = list(base) + list(inserts)
    for d in deletes:
        effective.remove(d)
    assert got == _model(effective)


def _model(data):
    agg = collections.defaultdict(lambda: [0, 0])
    for g, v in data:
        agg[g][0] += 1
        agg[g][1] += v
    return {g: (n, s) for g, (n, s) in agg.items() if n > 0}
