"""Checkpoint/resume: kill after iteration k, resume, bit-identical final
state (BASELINE.md checkpoint row; SURVEY §5 item 4)."""

import json
import os

import numpy as np

from graphminingtools_ray.algos import connected_components, pagerank
from graphminingtools_ray.graph import symmetrize
from graphminingtools_ray.state.checkpoint import CheckpointManager

from .conftest import PATH4, STAR_HUB, edges_ds


def test_manager_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), "digest-a", num_partitions=4)
    ids = np.arange(10, dtype=np.int64) * 7
    vals = np.linspace(0, 1, 10)
    mgr.save(0, ids, vals, meta={"x": 1})
    mgr.save(1, ids, vals * 2, meta={"x": 2})
    it, rids, rvals, meta = mgr.load_latest()
    assert it == 1 and meta == {"x": 2}
    assert np.array_equal(rids, ids)
    assert np.array_equal(rvals, vals * 2)
    # lineage metadata embedded per shard
    d = tmp_path / "ck" / "iter=1"
    mf = json.load(open(d / "MANIFEST.json"))
    assert mf["input_digest"] == "digest-a"
    # a manager with a different digest must NOT resume from these
    mgr2 = CheckpointManager(str(tmp_path / "ck"), "digest-b", num_partitions=4)
    assert mgr2.load_latest() is None


def test_pagerank_resume_bit_identical(tmp_path):
    edges = symmetrize(edges_ds(STAR_HUB))
    ck = str(tmp_path / "pr")

    # uninterrupted run: 8 fixed iterations
    ids_a, rank_a, _ = pagerank(edges, tol=0.0, max_iter=8)

    # "killed" run: 4 iterations, then resume to 8 via a fresh call
    pagerank(edges, tol=0.0, max_iter=4, checkpoint_dir=ck)
    assert sorted(os.listdir(ck)) == [f"iter={i}" for i in range(4)]
    ids_b, rank_b, info = pagerank(edges, tol=0.0, max_iter=8, checkpoint_dir=ck)
    assert info["resumed_from"] == 3
    assert info["supersteps"][0]["iteration"] == 4  # no recomputation of 0..3

    assert np.array_equal(ids_a, ids_b)
    assert np.array_equal(rank_a, rank_b)  # bit-identical, not just allclose


def test_pagerank_converged_checkpoint_short_circuits(tmp_path):
    edges = symmetrize(edges_ds(PATH4))
    ck = str(tmp_path / "pr2")
    ids_a, rank_a, info_a = pagerank(edges, tol=1e-6, checkpoint_dir=ck)
    assert info_a["converged"]
    ids_b, rank_b, info_b = pagerank(edges, tol=1e-6, checkpoint_dir=ck)
    assert info_b["supersteps"] == []  # nothing recomputed
    assert np.array_equal(rank_a, rank_b)


def test_cc_resume(tmp_path):
    edges = symmetrize(edges_ds(PATH4))
    ck = str(tmp_path / "cc")
    ids_a, lab_a, _ = connected_components(edges)
    connected_components(edges, max_iter=1, checkpoint_dir=ck)
    ids_b, lab_b, info = connected_components(edges, checkpoint_dir=ck)
    assert info["resumed_from"] == 0
    assert np.array_equal(ids_a, ids_b)
    assert np.array_equal(lab_a, lab_b)


def test_lpa_resume(tmp_path):
    from graphminingtools_ray.algos import label_propagation

    edges = symmetrize(edges_ds(PATH4))
    ck = str(tmp_path / "lpa")
    ids_a, lab_a, _ = label_propagation(edges, max_iter=6)
    label_propagation(edges, max_iter=2, checkpoint_dir=ck)
    ids_b, lab_b, info = label_propagation(edges, max_iter=6, checkpoint_dir=ck)
    assert info["resumed_from"] == 1
    assert np.array_equal(ids_a, ids_b)
    assert np.array_equal(lab_a, lab_b)


def test_kcore_resume(tmp_path):
    """Interrupted peel (max_iter=1) resumes from the committed round and
    reaches the same core as an uninterrupted run."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.kcore import k_core

    # a 16-vertex path feeding a 4-clique: k=2 peels the path inward from
    # the free end, one synchronous round per vertex — a long cascade
    pairs = [(i, i + 1) for i in range(16)] + [
        (16, 17), (16, 18), (16, 19), (17, 18), (17, 19), (18, 19)]
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    ck = str(tmp_path / "kcore")
    ids_a, fl_a, info_a = k_core(edges, k=2)
    assert info_a["iterations"] > 5  # the peel must be non-trivial
    k_core(edges, k=2, max_iter=3, checkpoint_dir=ck)
    ids_b, fl_b, info = k_core(edges, k=2, checkpoint_dir=ck)
    assert info["resumed_from"] == 2
    assert np.array_equal(ids_a, ids_b)
    assert np.array_equal(fl_a, fl_b)


def test_sssp_resume(tmp_path):
    """Interrupted BFS resumes from the committed round; distances equal an
    uninterrupted run (a path graph needs one round per hop)."""
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.algos.sssp import sssp_hops

    pairs = [(i, i + 1) for i in range(20)]
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    ck = str(tmp_path / "sssp")
    ids_a, d_a, info_a = sssp_hops(edges, source=0)
    assert info_a["iterations"] > 2
    sssp_hops(edges, source=0, max_iter=2, checkpoint_dir=ck)
    ids_b, d_b, info = sssp_hops(edges, source=0, checkpoint_dir=ck)
    assert info["resumed_from"] == 1
    assert np.array_equal(ids_a, ids_b)
    assert np.array_equal(d_a, d_b)


def test_walks_checkpoint_resume(tmp_path, ray_session):
    """Resumable walk corpus: a partial run's committed steps are reused by
    a longer run with the same args, bit-identically; digest/parameter
    mismatches fail loudly."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from graphminingtools_ray.graph.build import symmetrize
    from graphminingtools_ray.graph.walks import (
        random_walks,
        random_walks_checkpointed,
    )

    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3, 4, 0, 2], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 0, 2, 4], pa.int64()),
    }))
    sym = symmetrize(edges)
    ck = str(tmp_path / "walks")
    key = ["walk_id", "step", "vertex_id"]

    # partial run commits steps 1..2; the longer run reuses them
    random_walks_checkpointed(sym, ck, length=2, num_buckets=4).to_pandas()
    resumed = random_walks_checkpointed(
        sym, ck, length=4, num_buckets=4
    ).to_pandas().sort_values(key).reset_index(drop=True)
    fresh = random_walks(sym, length=4, num_buckets=4).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, fresh)

    # parameter mismatch (weighted flag) is rejected
    with pytest.raises(ValueError, match="weighted"):
        random_walks_checkpointed(sym, ck, length=2, num_buckets=4,
                                  weighted=True)

    # different graph against the same dir is rejected (digest guard)
    other = symmetrize(rd.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
    })))
    with pytest.raises(ValueError, match="digest"):
        random_walks_checkpointed(other, ck, length=2, num_buckets=4)


def test_node2vec_checkpoint_resume(tmp_path, ray_session):
    """node2vec checkpointed variant: resumed corpus == streaming corpus."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from graphminingtools_ray.graph.build import symmetrize
    from graphminingtools_ray.graph.walks import (
        node2vec_walks,
        random_walks_checkpointed,
    )

    edges = symmetrize(rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3, 4, 0], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 0, 2], pa.int64()),
    }))).materialize()
    ck = str(tmp_path / "n2v")
    key = ["walk_id", "step", "vertex_id"]
    random_walks_checkpointed(edges, ck, length=2, num_buckets=4,
                              node2vec=True).to_pandas()
    resumed = random_walks_checkpointed(
        edges, ck, length=4, num_buckets=4, node2vec=True
    ).to_pandas().sort_values(key).reset_index(drop=True)
    fresh = node2vec_walks(edges, length=4, num_buckets=4).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed, fresh)


def test_walks_checkpoint_dirty_step_dir(tmp_path, ray_session):
    """Leftover shards from a killed mid-write attempt must not leak into
    the recomputed step (parquet writes never overwrite; the step lands
    via tmp-dir + rename)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from graphminingtools_ray.graph.build import symmetrize
    from graphminingtools_ray.graph.walks import (
        random_walks,
        random_walks_checkpointed,
    )

    edges = symmetrize(rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 0], pa.int64()),
    }))).materialize()
    ck = tmp_path / "dirty"
    # simulate a killed attempt: step=1 dir exists with a stale partial
    # shard, but the manifest never committed it
    (ck / "step=1").mkdir(parents=True)
    pq.write_table(
        pa.table({"walk_id": pa.array([99], pa.int64()),
                  "v": pa.array([99], pa.int64())}),
        str(ck / "step=1" / "stale.parquet"),
    )
    key = ["walk_id", "step", "vertex_id"]
    got = random_walks_checkpointed(edges, str(ck), length=2, num_buckets=4) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    fresh = random_walks(edges, length=2, num_buckets=4).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, fresh)
    assert not os.path.exists(ck / "step=1.tmp")
