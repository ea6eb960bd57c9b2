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
    completed, skipped = [], []
    for part in range(n_partitions):
        for shard in range(n_sh):
            if (part, shard) in manifest:
                skipped.append(part if n_sh == 1 else (part, shard))
                continue
            unit = part * n_sh + shard
            t0 = time.monotonic()
            ds = ray.data.read_parquet(
                f"{data_dir}/transcripts.parquet",
                columns=["conv_id", "turn_idx", "role", "text"],
            ).map_batches(
                _make_partition_filter(unit, n_units), batch_format="pyarrow"
            )
            n_turns = ds.count()  # cheap column scan; recorded in lineage
            docs = assemble_documents(ds, max_doc_turns=kg.MAX_DOC_TURNS)
            triples = docs.map_batches(
                KGStage,
                fn_constructor_kwargs=dict(
                    ner_kwargs=dict(labels=kg.LABELS_NER, model=models["ner"]),
                    rel_kwargs=dict(labels=kg.LABELS_REL, model=models["rel"]),
                    el_kwargs=dict(kb=kb_ref, model=models["el"]),
                ),
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=pool, num_cpus=1,
            )

            tmp = os.path.join(raw_dir, f".tmp-{unit}-{uuid.uuid4().hex[:8]}")
            final = os.path.join(raw_dir, f"part={part}")
            if n_sh > 1:
                final = os.path.join(final, f"shard={shard}")
            triples.write_parquet(tmp)
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
            completed.append(part if n_sh == 1 else (part, shard))

            if (
                fail_after_partitions is not None
                and len(completed) >= fail_after_partitions
            ):
                raise RuntimeError(
                    f"injected failure after {len(completed)} units"
                )

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
