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
