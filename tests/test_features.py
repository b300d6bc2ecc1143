"""Feature-table utilities (pipelines/features.py): hstack merge, chi2
selection edge cases, stratified subset quota/selection semantics.
Reference anchors: python/mergeSparseFeatureFiles.py, selectTopFeatures.py,
subset.py (method 0)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graphminingtools_ray.pipelines.features import (
    merge_sparse_features,
    select_top_features,
    stratified_subset,
)


def _feats(rows):
    return rd.from_arrow(pa.table({
        "graph_id": pa.array([r[0] for r in rows], pa.int64()),
        "pattern_id": pa.array([r[1] for r in rows], pa.int64()),
        "pattern": pa.array([r[2] for r in rows], pa.string()),
    }))


def _labels(rows):
    return rd.from_arrow(pa.table({
        "graph_id": pa.array([r[0] for r in rows], pa.int64()),
        "cls": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_merge_default_offset_is_width_of_a(ray_session):
    a = _feats([(1, 0, "p0"), (2, 3, "p3")])
    b = _feats([(1, 0, "q0"), (3, 1, "q1")])
    out = merge_sparse_features(a, b).to_pandas()
    got = set(map(tuple, out.to_numpy()))
    # offset = max(a.pattern_id)+1 = 4
    assert got == {(1, 0, "p0"), (2, 3, "p3"), (1, 4, "q0"), (3, 5, "q1")}


def test_select_top_features_perfect_separator_wins(ray_session):
    # pattern "sep" present exactly in class A graphs; "noise" in all
    labels = _labels([(i, "A" if i < 4 else "B") for i in range(8)])
    rows = [(i, 0, "sep") for i in range(4)]
    rows += [(i, 1, "noise") for i in range(8)]
    rows += [(5, 2, "rare")]
    out = select_top_features(_feats(rows), labels, k=3)
    assert list(out["pattern"]) [0] == "sep"
    # a feature present everywhere carries zero signal
    assert float(out[out["pattern"] == "noise"]["chi2"].iloc[0]) == 0.0
    # perfect separator, balanced 2-class universe: each class term
    # (obs - t/2)^2 / (t/2) = 2 -> chi2 = 4
    assert float(out[out["pattern"] == "sep"]["chi2"].iloc[0]) == 4.0


def test_stratified_subset_quotas_and_determinism(ray_session):
    # 60/30/10 split, n=10 -> quotas 6/3/1 exactly (no remainders)
    rows = [(i, "a") for i in range(60)]
    rows += [(100 + i, "b") for i in range(30)]
    rows += [(200 + i, "c") for i in range(10)]
    out = stratified_subset(_labels(rows), n=10)
    counts = out["cls"].value_counts().to_dict()
    assert counts == {"a": 6, "b": 3, "c": 1}
    again = stratified_subset(_labels(rows), n=10)
    pd.testing.assert_frame_equal(out, again)


def test_stratified_subset_largest_remainder_tiebreak(ray_session):
    # 3 classes of 3 rows each, n=4: floors 1 each, one extra by remainder
    # (all equal) -> tie broken by class NAME ascending -> 'a' gets it
    rows = [(i, c) for i, c in enumerate(["a"] * 3 + ["b"] * 3 + ["c"] * 3)]
    out = stratified_subset(_labels(rows), n=4)
    assert out["cls"].value_counts().to_dict() == {"a": 2, "b": 1, "c": 1}


def test_stratified_subset_n_exceeding_universe(ray_session):
    rows = [(i, "a") for i in range(3)]
    out = stratified_subset(_labels(rows), n=99)
    assert len(out) == 3  # capped at the universe


def test_stratified_subset_empty(ray_session):
    out = stratified_subset(_labels([]), n=5)
    assert len(out) == 0


def test_tci_mean_micro(ray_session):
    """tciMean semantics on a hand-checked score table: geometric mean and
    geometric SD per (method, class) vs direct math over the same fold."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.pipelines.features import tci_mean

    scores = rd.from_arrow(pa.table({
        "method": ["m1"] * 4 + ["m2"] * 2,
        "label": ["+", "+", "-", "-", "+", "+"],
        "score": [1.0, 4.0, 2.0, 8.0, 3.0, 3.0],
    }))
    out = tci_mean(scores)
    # m2/pos: identical scores -> gsd == 1 exactly (u == 0 for every term),
    # gmean == exp(ln 3) (one ulp off 3.0 — the fold is what's pinned)
    m2 = out[(out["method"] == "m2") & (out["cls"] == "pos")].iloc[0]
    g3 = math.exp((math.log(3.0) + math.log(3.0)) / 2)
    assert m2["gmean"] == g3 and m2["gsd"] == math.exp(
        math.sqrt((lambda u: (u * u + u * u) / 2)(math.log(3.0 / g3)))
    )
    assert m2["lo"] == g3 / math.sqrt(m2["gsd"])
    assert m2["hi"] == g3 * math.sqrt(m2["gsd"])
    # m2 has no '-' rows: no neg class emitted
    assert not ((out["method"] == "m2") & (out["cls"] == "neg")).any()
    # m1/pos: gm = sqrt(1*4) = 2; gsd = exp(sqrt(mean(ln(x/2)^2)))
    m1 = out[(out["method"] == "m1") & (out["cls"] == "pos")].iloc[0]
    assert m1["gmean"] == math.exp((math.log(1.0) + math.log(4.0)) / 2)
    u = [math.log(1.0 / m1["gmean"]), math.log(4.0 / m1["gmean"])]
    exp_gsd = math.exp(math.sqrt((u[0] * u[0] + u[1] * u[1]) / 2))
    assert m1["gsd"] == exp_gsd
    assert m1["lo"] == m1["gmean"] / math.sqrt(exp_gsd)
    # m1/all: n = 4
    assert int(out[(out["method"] == "m1")
                   & (out["cls"] == "all")].iloc[0]["n"]) == 4
