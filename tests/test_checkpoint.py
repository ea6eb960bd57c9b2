"""Checkpoint/resume: kill mid-run, rerun skips completed partitions, output
identical to an uninterrupted run; config-change guard fails fast
(partition-level analog of /root/reference/spacy_llm/tests/test_cache.py:90-137)."""

import json
import os
import shutil

import pandas as pd
import pytest

from spacy_llm_ray.data import ensure_dataset
from spacy_llm_ray.pipelines import kg
from spacy_llm_ray.state.checkpoint import (
    ConfigMismatchError,
    read_manifest,
    run_partitioned_kg,
)

N_PARTS = 4


def _load_triples(out_dir):
    import glob

    files = glob.glob(os.path.join(out_dir, "triples", "*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files])
    return set(map(tuple, df[kg.FINAL_COLUMNS].values))


@pytest.fixture(scope="module")
def sf_dir(ray_session):
    return ensure_dataset("sf0.001")


def test_resume_after_crash(sf_dir, tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("kg_full"))
    out_b = str(tmp_path_factory.mktemp("kg_resumed"))

    # Uninterrupted reference run.
    summary = run_partitioned_kg(sf_dir, out_a, n_partitions=N_PARTS)
    assert summary["completed"] == list(range(N_PARTS))

    # Crash after 2 partitions.
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned_kg(sf_dir, out_b, n_partitions=N_PARTS, fail_after_partitions=2)
    manifest = read_manifest(out_b)
    assert sorted(manifest) == [(0, 0), (1, 0)]
    assert not os.path.exists(os.path.join(out_b, "_SUCCESS"))

    # Resume: only the missing partitions run.
    summary = run_partitioned_kg(sf_dir, out_b, n_partitions=N_PARTS)
    assert summary["skipped"] == [0, 1]
    assert summary["completed"] == [2, 3]

    assert _load_triples(out_a) == _load_triples(out_b)


def test_lineage_records(sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_lineage"))
    run_partitioned_kg(sf_dir, out, n_partitions=N_PARTS)
    manifest = read_manifest(out)
    assert sorted(manifest) == [(p, 0) for p in range(N_PARTS)]
    for rec in manifest.values():
        assert rec["n_triples"] >= 0
        assert rec["duration_s"] > 0
        assert len(rec["config_hash"]) == 16
    with open(os.path.join(out, "_SUCCESS")) as f:
        success = json.load(f)
    assert success["n_partitions"] == N_PARTS


def test_config_change_guard(sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_guard"))
    run_partitioned_kg(sf_dir, out, n_partitions=2)
    # Changing the task config (labels) must fail fast, not mix stale output
    # (cache.py:96-122 template-fingerprint analog).
    models = kg.default_models(context_length=99)  # different context length
    with pytest.raises(ConfigMismatchError):
        run_partitioned_kg(sf_dir, out, n_partitions=2, models=models)


def test_matches_unpartitioned_pipeline(sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_eq"))
    run_partitioned_kg(sf_dir, out, n_partitions=3)
    direct = set(
        map(tuple, kg.kg_triples_dataset(sf_dir).to_pandas()[kg.FINAL_COLUMNS].values)
    )
    assert _load_triples(out) == direct


def test_partitioned_distributed_canon_route_matches(
    sf_dir, tmp_path_factory, monkeypatch
):
    """Force the checkpointed runner past the pair bound: the distributed
    CC + hash-join canonicalization branch (the 100-TB route) must emit
    the same triples as the driver route, and the _SUCCESS lineage must
    record the routing decision it actually took."""
    out_driver = str(tmp_path_factory.mktemp("kg_canon_drv"))
    run_partitioned_kg(sf_dir, out_driver, n_partitions=2)
    with open(os.path.join(out_driver, "_SUCCESS")) as f:
        assert json.load(f)["canon_route"]["route"] == "driver"

    monkeypatch.setattr(kg, "DRIVER_CANON_MAX_PAIRS", 0)
    out_dist = str(tmp_path_factory.mktemp("kg_canon_dist"))
    run_partitioned_kg(sf_dir, out_dist, n_partitions=2)
    with open(os.path.join(out_dist, "_SUCCESS")) as f:
        rec = json.load(f)["canon_route"]
    assert rec["route"] == "distributed" and rec["forced"] is False

    assert _load_triples(out_dist) == _load_triples(out_driver)


def test_subpartition_shard_resume(sf_dir, tmp_path_factory):
    """n_shards_per_partition=2: a crash mid-partition loses at most one
    SHARD; resume skips completed shards and the final output matches the
    unsharded-checkpoint run byte-for-byte."""
    out_a = str(tmp_path_factory.mktemp("kg_shard_full"))
    out_b = str(tmp_path_factory.mktemp("kg_shard_resumed"))

    summary = run_partitioned_kg(
        sf_dir, out_a, n_partitions=2, n_shards_per_partition=2
    )
    assert summary["completed"] == [(0, 0), (0, 1), (1, 0), (1, 1)]

    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned_kg(
            sf_dir, out_b, n_partitions=2, n_shards_per_partition=2,
            fail_after_partitions=3,
        )
    manifest = read_manifest(out_b)
    assert sorted(manifest) == [(0, 0), (0, 1), (1, 0)]

    summary = run_partitioned_kg(
        sf_dir, out_b, n_partitions=2, n_shards_per_partition=2
    )
    assert summary["skipped"] == [(0, 0), (0, 1), (1, 0)]
    assert summary["completed"] == [(1, 1)]
    assert _load_triples(out_a) == _load_triples(out_b)


def test_concurrent_units_match_sequential(sf_dir, tmp_path_factory):
    """unit_parallelism overlaps per-unit fixed costs; output must be
    byte-identical to the sequential run."""
    out_a = str(tmp_path_factory.mktemp("kg_seq"))
    out_b = str(tmp_path_factory.mktemp("kg_par"))
    run_partitioned_kg(sf_dir, out_a, n_partitions=2, n_shards_per_partition=2)
    summary = run_partitioned_kg(
        sf_dir, out_b, n_partitions=2, n_shards_per_partition=2,
        unit_parallelism=4,
    )
    assert sorted(summary["completed"]) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert _load_triples(out_a) == _load_triples(out_b)


def test_phase0_lineage_and_data_fingerprint(sf_dir, tmp_path_factory):
    """Phase-0 writes its own lineage record; changing the source data (a)
    rebuilds the input snapshot when nothing is checkpointed yet, (b) fails
    fast once units have committed against the old snapshot."""
    import time as _time

    # Work on a private copy of the dataset so mtime bumps don't leak.
    src_copy = str(tmp_path_factory.mktemp("data_copy"))
    shutil.copytree(sf_dir, src_copy, dirs_exist_ok=True)
    out = str(tmp_path_factory.mktemp("kg_fp"))

    run_partitioned_kg(src_copy, out, n_partitions=N_PARTS)
    rec = json.load(open(os.path.join(out, "_lineage", "phase0.json")))
    assert rec["phase"] == 0 and rec["n_units"] == N_PARTS
    fp1 = open(os.path.join(out, f"_input_units={N_PARTS}", "_DONE")).read()

    # Touch the source -> fingerprint changes -> resuming over completed
    # units must fail fast, not silently mix snapshots.
    tp = os.path.join(src_copy, "transcripts.parquet")
    target = tp if os.path.isfile(tp) else os.path.join(
        tp, sorted(os.listdir(tp))[0]
    )
    os.utime(target, (int(_time.time()) + 10, int(_time.time()) + 10))
    with pytest.raises(ConfigMismatchError):
        run_partitioned_kg(src_copy, out, n_partitions=N_PARTS)

    # Fresh output dir: the snapshot rebuilds under the new fingerprint.
    out2 = str(tmp_path_factory.mktemp("kg_fp2"))
    run_partitioned_kg(src_copy, out2, n_partitions=N_PARTS)
    fp2 = open(os.path.join(out2, f"_input_units={N_PARTS}", "_DONE")).read()
    assert fp1 != fp2
    assert _load_triples(out) == _load_triples(out2)

    # A MISSING _DONE marker with committed units must also fail fast —
    # silently rebuilding the snapshot would mix two datasets in one output.
    os.remove(os.path.join(out2, f"_input_units={N_PARTS}", "_DONE"))
    with pytest.raises(ConfigMismatchError, match="missing its _DONE marker"):
        run_partitioned_kg(src_copy, out2, n_partitions=N_PARTS)


def test_partition_array_deterministic_and_vectorized():
    from spacy_llm_ray.state.checkpoint import _partition_array, _partition_of

    ids = [f"conv-{i:06d}" for i in range(1000)] + ["x" * 100, ""]
    arr = _partition_array(ids, 16)
    assert arr.min() >= 0 and arr.max() < 16
    # scalar wrapper agrees with the vectorized path
    assert all(int(arr[i]) == _partition_of(c, 16) for i, c in enumerate(ids))
    # deterministic across calls
    assert (arr == _partition_array(ids, 16)).all()


def test_partition_array_handles_non_ascii_ids():
    """Unicode conv_ids must hash (utf-8), not crash on the ASCII fast path;
    ASCII ids keep their pre-fix partition assignment (resume compat)."""
    import numpy as np

    from spacy_llm_ray.state.checkpoint import _partition_array

    parts = _partition_array(["conv-ü-001", "conversación-7", "conv-a"], 8)
    assert parts.dtype == np.int32 and len(parts) == 3
    # ASCII compatibility with the previous S48 direct-view implementation.
    raw = np.asarray(["conv-a"], dtype="S48")
    mat = raw.view(np.uint8).reshape(1, -1)
    acc = np.zeros(1, dtype=np.uint64)
    for j in range(mat.shape[1]):
        acc = acc * np.uint64(257) + mat[:, j]
    # NB: modulo with np.uint64, not a Python int — numpy promotes
    # uint64 % int to float64 and silently loses low bits.
    assert parts[2] == int(acc[0] % np.uint64(8))
