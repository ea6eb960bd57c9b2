"""Warm-task dispatch: content-keyed stage cache + in-flight throttle.

The stage cache must key on the CONTENT of (stage_cls, stage_kwargs), not
on the ObjectRef identity of any particular ray.put — a fresh ref per
invocation would defeat cross-invocation reuse and leak one stale instance
per call into long-lived workers (r3 ADVICE, medium)."""

import sys
import threading

import pyarrow as pa
import pytest
import ray
from ray import cloudpickle

from spacy_llm_ray.stages import dispatch

# Test-local stage classes aren't importable by worker processes (tests/ is
# not on their sys.path) — ship them by value instead of by reference.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class _CountingStage:
    built = 0  # per-process; tests run it driver-side via _cached_stage

    def __init__(self, tag="a", factor=2):
        type(self).built += 1
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "y", pa.compute.multiply(batch["x"], self.factor)
        )


class _OtherStage(_CountingStage):
    pass


def test_content_key_deterministic_across_calls():
    k1 = dispatch._content_key(_CountingStage, {"tag": "a", "factor": 2})
    k2 = dispatch._content_key(_CountingStage, {"tag": "a", "factor": 2})
    k3 = dispatch._content_key(_CountingStage, {"tag": "b", "factor": 2})
    assert k1 == k2
    assert k1 != k3
    assert dispatch._content_key(_OtherStage, {"tag": "a", "factor": 2}) != k1


def test_kwargs_ref_memoized_one_put_per_config(ray_session):
    dispatch._KWARGS_REF_MEMO.clear()
    kwargs = {"tag": "memo", "factor": 3}
    key = dispatch._content_key(_CountingStage, kwargs)
    r1 = dispatch._kwargs_ref_for(key, kwargs)
    r2 = dispatch._kwargs_ref_for(key, kwargs)
    assert r1 == r2  # same ObjectRef: one ray.put per distinct config
    other = dispatch._kwargs_ref_for(
        dispatch._content_key(_CountingStage, {"tag": "x", "factor": 3}),
        {"tag": "x", "factor": 3},
    )
    assert other != r1
    # Unpicklable configs fall back to a fresh, uncached put.
    assert dispatch._content_key(_CountingStage, {"bad": threading.Lock()}) is None


def test_stage_cache_reuses_instance_and_evicts_same_class(ray_session):
    dispatch._STAGE_CACHE.clear()
    _CountingStage.built = 0
    ref = ray.put({"tag": "a", "factor": 2})
    inst1 = dispatch._cached_stage(_CountingStage, ref, "key-a")
    inst2 = dispatch._cached_stage(_CountingStage, ref, "key-a")
    assert inst1 is inst2
    assert _CountingStage.built == 1
    # A second config coexists (per-class bound is 2)...
    dispatch._cached_stage(_CountingStage, ray.put({"tag": "b", "factor": 2}), "key-b")
    assert (_CountingStage, "key-a") in dispatch._STAGE_CACHE
    # ...but a third evicts the OLDEST same-class entry, not unrelated ones.
    dispatch._cached_stage(_OtherStage, ray.put({"tag": "z", "factor": 2}), "key-z")
    dispatch._cached_stage(_CountingStage, ray.put({"tag": "c", "factor": 2}), "key-c")
    assert (_CountingStage, "key-a") not in dispatch._STAGE_CACHE
    assert (_CountingStage, "key-b") in dispatch._STAGE_CACHE
    assert (_OtherStage, "key-z") in dispatch._STAGE_CACHE


def _run_pipeline(result, idx, cap):
    import ray.data

    ds = ray.data.range(400).map_batches(
        lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow"
    )
    out = dispatch.stage_map_batches(
        ds,
        _CountingStage,
        {"tag": f"p{idx}", "factor": idx + 2},
        batch_size=50,
        task_max_in_flight=cap,
    )
    result[idx] = sorted(r["y"] for r in out.take_all())


def test_flagship_stage_config_content_keys_stably(ray_session):
    """Two independently-built flagship stage configs (fresh KB + fresh
    model objects, same content) must produce the SAME content key and hit
    the same memoized kwargs ref — pinning the regression class where a
    pre-made ray.put ref (fresh ref id per call) lands in stage kwargs and
    silently defeats the warm-stage cache forever."""
    from spacy_llm_ray.data import transcripts as tdata
    from spacy_llm_ray.pipelines import kg
    from spacy_llm_ray.stages.llm_stage import KGStage

    def build_kwargs():
        models = kg.default_models()
        return dict(
            ner_kwargs=dict(labels=kg.LABELS_NER, model=models["ner"]),
            rel_kwargs=dict(labels=kg.LABELS_REL, model=models["rel"]),
            el_kwargs=dict(kb=tdata.build_kb(), model=models["el"]),
        )

    k1 = dispatch._content_key(KGStage, build_kwargs())
    k2 = dispatch._content_key(KGStage, build_kwargs())
    assert k1 is not None and k1 == k2
    r1 = dispatch._kwargs_ref_for(k1, build_kwargs())
    r2 = dispatch._kwargs_ref_for(k2, build_kwargs())
    assert r1 == r2  # one ray.put per distinct config, memo hit


def test_two_concurrent_pipelines_with_in_flight_cap(ray_session):
    """task_max_in_flight throttles the warm-task path (r3 VERDICT #3): two
    pipelines sharing the cluster both finish correctly under a 2-task cap."""
    results = {}
    threads = [
        threading.Thread(target=_run_pipeline, args=(results, i, 2))
        for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0] == [x * 2 for x in range(400)]
    assert results[1] == [x * 3 for x in range(400)]


def test_throttled_plan_sets_task_concurrency(ray_session):
    import ray.data

    ds = ray.data.range(10).map_batches(
        lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow"
    )
    out = dispatch.stage_map_batches(
        ds, _CountingStage, {"tag": "capped", "factor": 2}, task_max_in_flight=1
    )
    assert sorted(r["y"] for r in out.take_all()) == [x * 2 for x in range(10)]


def test_large_value_digest_memoized_per_object(ray_session):
    """r4 ADVICE (low): a large payload must be serialized+hashed once per
    live OBJECT, not once per stage_map_batches call — and the memo entry
    must die with the object (weakref finalizer), never aliasing a
    recycled id. Arrays opt in to the memo by being frozen (writeable
    arrays re-hash every call so in-place mutation can't serve a stale
    digest — see test_digest_memo_mutation_guards)."""
    import numpy as np

    big = np.arange(1_000_000, dtype=np.float64)  # 8 MB, > _MEMO_MIN_BYTES
    big.flags.writeable = False
    k1 = dispatch._content_key(_CountingStage, {"m": big, "tag": "a"})
    assert id(big) in dispatch._OBJ_DIGEST_MEMO
    d1 = dispatch._OBJ_DIGEST_MEMO[id(big)]
    k2 = dispatch._content_key(_CountingStage, {"m": big, "tag": "a"})
    assert k1 == k2
    assert dispatch._OBJ_DIGEST_MEMO[id(big)] is d1  # memo hit, no re-hash
    # Content-equal but distinct object -> same digest (content key, not
    # identity key) — writeable or not.
    big2 = np.arange(1_000_000, dtype=np.float64)
    assert dispatch._content_key(_CountingStage, {"m": big2, "tag": "a"}) == k1
    # Nested inside a kwargs dict still hits the leaf memo.
    k3 = dispatch._content_key(_CountingStage, {"inner": {"m": big}})
    assert id(big) in dispatch._OBJ_DIGEST_MEMO and k3 is not None
    bid = id(big)
    del big, big2
    import gc

    gc.collect()
    assert bid not in dispatch._OBJ_DIGEST_MEMO  # finalizer evicted


def test_kwargs_ref_memo_size_aware_eviction(ray_session):
    """r4 ADVICE (low): the kwargs-ref memo evicts by payload bytes, not
    only by entry count — big configs cannot pin unbounded object-store
    memory for the driver's lifetime."""
    import numpy as np

    dispatch._KWARGS_REF_MEMO.clear()
    old_budget = dispatch._KWARGS_REF_MEMO_MAX_BYTES
    dispatch._KWARGS_REF_MEMO_MAX_BYTES = 20 << 20  # 20 MB budget
    try:
        keys = []
        for i in range(3):
            kw = {"m": np.full(1_250_000, float(i)), "tag": i}  # ~10 MB each
            k = dispatch._content_key(_CountingStage, kw)
            dispatch._kwargs_ref_for(k, kw)
            keys.append(k)
        # 3 x 10 MB > 20 MB budget -> the oldest entry was evicted.
        assert keys[0] not in dispatch._KWARGS_REF_MEMO
        assert keys[2] in dispatch._KWARGS_REF_MEMO
        assert len(dispatch._KWARGS_REF_MEMO) <= 2
    finally:
        dispatch._KWARGS_REF_MEMO_MAX_BYTES = old_budget
        dispatch._KWARGS_REF_MEMO.clear()


def test_default_task_cap_bounds_flagship_fanout(ray_session):
    """r4 VERDICT #7: the warm-task path defaults to a derived in-flight
    cap (cluster task slots) instead of uncapped — asserted at the policy
    level and by running two concurrent DEFAULT-cap pipelines to completion
    (the two-pipeline test above uses an explicit cap)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # 2x headroom over the build-time slot snapshot (r5 review: a static
    # snapshot otherwise permanently caps an autoscaling cluster).
    assert dispatch._default_task_cap(1) == max(2, 2 * cpus)
    assert dispatch._default_task_cap(2) == max(2, 2 * (cpus // 2))

    results = {}
    threads = [
        threading.Thread(target=_run_pipeline, args=(results, i, None))
        for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0] == [x * 2 for x in range(400)]
    assert results[1] == [x * 3 for x in range(400)]


def test_digest_memo_mutation_guards():
    """In-place-mutation contract of the per-object digest memo: writeable
    numpy arrays are never memoized (mutation must change the content key),
    frozen arrays are, and an object bumping _content_version (InMemoryKB's
    mutators) re-digests to a new key after mutation."""
    import numpy as np

    # Writeable array (> _MEMO_MIN_BYTES): mutation changes the key.
    arr = np.zeros(1 << 18, dtype=np.int64)  # 2 MiB
    k1 = dispatch._content_key(_CountingStage, {"m": arr})
    assert id(arr) not in dispatch._OBJ_DIGEST_MEMO
    arr[0] = 7
    assert dispatch._content_key(_CountingStage, {"m": arr}) != k1

    # Frozen array: memoized, key stable across calls.
    frozen = np.ones(1 << 18, dtype=np.int64)
    frozen.flags.writeable = False
    f1 = dispatch._content_key(_CountingStage, {"m": frozen})
    assert id(frozen) in dispatch._OBJ_DIGEST_MEMO
    assert dispatch._content_key(_CountingStage, {"m": frozen}) == f1

    # Versioned object: a KB big enough to be memoized re-digests after a
    # mutator bumps _content_version.
    from spacy_llm_ray.kb import InMemoryKB

    kb = InMemoryKB()
    for i in range(300):  # ~1.2 MB pickled (distinct strings: no pickle memo)
        kb.add_entity(f"Q{i}", f"Entity {i}", f"{i}:" + "x" * 4096)
    b1 = dispatch._content_key(_CountingStage, {"kb": kb})
    assert id(kb) in dispatch._OBJ_DIGEST_MEMO
    assert dispatch._content_key(_CountingStage, {"kb": kb}) == b1
    kb.add_alias("entity 0", ["Q0"], [1.0])
    b2 = dispatch._content_key(_CountingStage, {"kb": kb})
    assert b2 != b1
    # And the memo now serves the post-mutation digest, stably.
    assert dispatch._content_key(_CountingStage, {"kb": kb}) == b2
