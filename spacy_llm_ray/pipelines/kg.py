"""End-to-end knowledge-graph construction pipeline (the flagship).

Composes (SURVEY.md §7.1):

    read_parquet(transcripts)                       # pruned columns
      -> assemble_documents                          # salted groupby(conv_id)
      -> NerStage      (actor pool, Arrow batches)   # mentions
      -> RelStage      (actor pool)                  # rel index pairs
      -> ElStage       (actor pool, broadcast KB)    # kb_ids
      -> explode_triples                             # (subj, pred, obj) rows
      -> canonicalize  (driver union-find over distinct pairs, broadcast map)
      -> distinct      (groupby hash dedup)

Models default to the deterministic mock stack over the synthetic-dataset
gazetteer, so the output is verifiable against the DuckDB oracle; swap in
REST/HF-backed models via the ``models`` argument for real LLM runs.
"""

from __future__ import annotations

from typing import Dict, Optional

from ..data import transcripts as tdata
from ..kb import InMemoryKB
from ..models.mock import MockELModel, MockNERModel, MockRELModel
from ..stages.assemble import assemble_documents
from ..stages.canonicalize import build_canonical_mapping, canonicalize_triples
from ..stages.llm_stage import ElStage, NerStage, RelStage
from ..stages.triples import explode_triples

LABELS_NER = ["PERSON", "GPE", "ORG"]
LABELS_REL = ["LivesIn", "Visits", "WorksIn"]

# Mock models see a context length so giant conversations exercise the shard
# mapper exactly as an API-bound model would (gpt-3.5's 4097 is the reference
# default divisor, models/rest/openai/model.py:147-173).
DEFAULT_CONTEXT_LENGTH = 4097


def default_models(context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH) -> Dict:
    return {
        "ner": MockNERModel(tdata.GAZETTEER, context_length=context_length),
        "rel": MockRELModel(tdata.PREDICATES, context_length=context_length),
        "el": MockELModel(context_length=context_length),
    }


def _pool(frac: float = 0.4) -> tuple:
    """Actor-pool sizing: autoscaling (max/2, max) bounded by cluster CPUs so
    three concurrent LLM pools + read/write stages share the node; the high
    floor pre-warms actors instead of ramping from 1 mid-run."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    hi = max(2, int(cpus * frac))
    return (max(1, hi // 2), hi)


def transcripts_dataset(sf_dir: str, columns=None):
    """Synthesize (once) + read the transcript table for a scale factor.
    ``sf_dir`` is a testdata dir (basename sf*) or a generated-data dir."""
    import ray.data

    from ..stages.arrow_utils import clean_read_schema

    data_dir = tdata.ensure_dataset(sf_dir)
    path = f"{data_dir}/transcripts.parquet"
    cols = columns or ["conv_id", "turn_idx", "role", "text"]
    # Metadata-free schema at the read: parquet's b'pandas' metadata makes
    # pa.Schema unhashable (pyarrow 16) and disables Ray's schema dedup in
    # every downstream operator if it leaks into the blocks.
    return ray.data.read_parquet(
        path, columns=cols, schema=clean_read_schema(path, cols)
    )


# Cap applied in the extraction pipelines: a conversation longer than this is
# split into independent chunk documents at turn boundaries (parallelizes the
# Zipf-head conversation; relation locality bounded to the chunk window, as
# the context-length shard mapper already bounds it within a document).
MAX_DOC_TURNS = 512


def _assembly_buckets(sf_dir: str) -> int:
    """Shuffle-bucket count for document assembly, scaled with DATA size
    (~8 MB of estimated in-memory turns per bucket, floor = cluster CPUs,
    cap 65536): Ray's sort-shuffle cost grows with the reducer count, so a
    CPU-multiple constant over-buckets small inputs while a constant would
    under-bucket 100 TB."""
    import os

    import ray

    path = f"{tdata.ensure_dataset(sf_dir)}/transcripts.parquet"
    if os.path.isdir(path):
        nbytes = sum(
            os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
        )
    else:
        nbytes = os.path.getsize(path)
    est_mem = nbytes * 4  # parquet -> in-memory string expansion
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(65536, max(cpus, est_mem // (8 << 20))))


def documents_dataset(sf_dir: str, max_doc_turns=None):
    return assemble_documents(
        transcripts_dataset(sf_dir),
        num_buckets=_assembly_buckets(sf_dir),
        max_doc_turns=max_doc_turns,
    )


def kg_mentions_dataset(sf_dir: str, models: Optional[Dict] = None, batch_size: int = 64):
    from ..stages.dispatch import stage_map_batches

    models = models or default_models()
    docs = documents_dataset(sf_dir, max_doc_turns=MAX_DOC_TURNS)
    return stage_map_batches(
        docs,
        NerStage,
        dict(labels=LABELS_NER, model=models["ner"]),
        batch_size=batch_size,
        concurrency=_pool(),
        models=(models["ner"],),
    )


def kg_relations_dataset(sf_dir: str, models: Optional[Dict] = None, batch_size: int = 64):
    from ..stages.dispatch import stage_map_batches

    models = models or default_models()
    mentions = kg_mentions_dataset(sf_dir, models, batch_size)
    return stage_map_batches(
        mentions,
        RelStage,
        dict(labels=LABELS_REL, model=models["rel"]),
        batch_size=batch_size,
        concurrency=_pool(),
        models=(models["rel"],),
    )


def kg_linked_dataset(
    sf_dir: str,
    models: Optional[Dict] = None,
    kb: Optional[InMemoryKB] = None,
    batch_size: int = 64,
):
    from ..stages.dispatch import stage_map_batches

    models = models or default_models()
    rels = kg_relations_dataset(sf_dir, models, batch_size)
    # The KB ships as a plain object in the stage kwargs: the dispatch
    # layer content-keys the config and does ONE ray.put per distinct KB
    # (broadcast), so repeat invocations hit the warm stage cache. A
    # pre-made ray.put ref here would mint a fresh ref id per call and
    # defeat that memo (same fix as the q3 broadcast keys).
    return stage_map_batches(
        rels,
        ElStage,
        dict(kb=kb or tdata.build_kb(), model=models["el"]),
        batch_size=batch_size,
        concurrency=_pool(),
        models=(models["el"],),
    )


def distinct_triples(triples_ds, keys=("conv_id", "subj", "pred", "obj"),
                     num_buckets: int = None):
    """Exact dedup: hash-partition on a key *bucket*, vectorized
    drop_duplicates per bucket (SURVEY.md §2.7).

    Grouping by a bucket of the key rather than the key itself keeps the
    group count at O(num_buckets) — the per-group UDF runs one vectorized
    pandas pass over many keys instead of one Python call per distinct key.
    Local per-batch dedup first acts as a combiner, shrinking the shuffle.

    The bucket count scales with DATA volume (~64 MB of input per bucket),
    not a fixed CPU multiple: Ray's sort-shuffle cost grows with the reducer
    count, so 96 reducers over a 20 MB triple set is pure overhead (3.4 s vs
    1.6 s at sf0.1), while at 100 TB the same rule yields thousands of
    buckets, each still memory-bounded.
    """
    import pandas as pd
    import pyarrow as pa

    from ..stages.arrow_utils import df_table, pandas_udf

    keys = list(keys)
    nb = num_buckets
    if nb is None:
        from ray.data.dataset import MaterializedDataset

        sz = None
        if isinstance(triples_ds, MaterializedDataset):
            try:  # materialized: size known without triggering execution
                sz = triples_ds.size_bytes()
            except Exception:
                sz = None
        if sz:
            nb = max(8, -(-sz // (64 << 20)))
        else:
            nb = _pool()[1] * 8

    def local_dedup(batch: "pa.Table"):
        df = batch.to_pandas()
        df = df.drop_duplicates(subset=keys)
        # Vectorized row hash (deterministic: fixed hash_key) — bucket
        # assignment only affects shuffle balance, never output values.
        h = pd.util.hash_pandas_object(df[keys], index=False)
        df = df.assign(_bucket=(h % nb).astype("int32"))
        return df_table(df)

    pre = triples_ds.map_batches(local_dedup, batch_format="pyarrow")
    out = pre.groupby("_bucket").map_groups(
        pandas_udf(
            lambda g: g.drop_duplicates(subset=keys).drop(columns=["_bucket"])
        ),
        batch_format="pandas",
    )
    return out


FINAL_COLUMNS = [
    "conv_id", "subj", "pred", "obj",
    "subj_qid", "obj_qid", "subj_canon", "obj_canon",
]


def kg_raw_triples_dataset(
    sf_dir: str,
    models: Optional[Dict] = None,
    kb: Optional[InMemoryKB] = None,
    batch_size: int = 64,
    docs=None,
):
    """documents -> fused NER+REL+EL+explode stage -> raw triples.

    The stage consumes only (conv_id, text): other document columns
    (turn_offsets list<struct>, n_turns, chunk_idx) are pruned before the
    stage so they never ship into extraction batches.
    """
    import ray

    from ..stages.dispatch import stage_map_batches
    from ..stages.llm_stage import KGStage

    models = models or default_models()
    # Plain object, not a pre-made ray.put ref: the dispatch layer
    # content-keys the stage kwargs and does one put per distinct KB, so
    # repeat invocations hit the warm stage cache (a fresh ref id per call
    # would miss every time).
    kb_obj = kb or tdata.build_kb()
    if docs is None:
        docs = documents_dataset(sf_dir, max_doc_turns=MAX_DOC_TURNS)
    docs = docs.select_columns(["conv_id", "text"])
    # Actor path (real model backends): the fused stage is the only heavy
    # pool in the flagship — a FIXED-size pool owning nearly the whole node
    # (autoscaling ramps too slowly to saturate within a stage's lifetime;
    # read/write stages keep a small CPU reserve). Mock/deterministic
    # backends run as warm-worker tasks instead (stages/dispatch.py).
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    hi = max(2, cpus - max(1, cpus // 8))
    return stage_map_batches(
        docs,
        KGStage,
        dict(
            ner_kwargs=dict(labels=LABELS_NER, model=models["ner"]),
            rel_kwargs=dict(labels=LABELS_REL, model=models["rel"]),
            el_kwargs=dict(kb=kb_obj, model=models["el"]),
        ),
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=hi,
        models=tuple(models.values()),
    )


# Auto-route bound for the canonicalization mapping: the driver union-find
# holds the distinct (surface, qid) pair set in driver memory — safe up to
# ~10^7 pairs (a few GB). Past the bound the distributed CC path computes
# the same mapping (byte-identical, oracle-checked) with no driver-side
# pair set. The estimate is an UPPER bound (2 pairs per distinct triple
# row), so a 100-TB run can never silently exceed the driver's memory —
# at worst a small-vocabulary corpus routes to the (correct, slightly
# slower) distributed path.
DRIVER_CANON_MAX_PAIRS = 5_000_000

# LAST routing decision, for interactive inspection only. Concurrent
# pipelines on one driver overwrite each other here — anything durable
# (checkpoint lineage) must use the decision dict _route_canon RETURNS,
# never this global.
CANON_ROUTE: Dict = {}


def _route_canon(distributed_canon: Optional[bool], dedup) -> Dict:
    """Resolve the canonicalization route; returns the decision record
    (``route`` is 'distributed' or 'driver') for callers to branch on and
    persist into checkpoint lineage. Also mirrored into CANON_ROUTE for
    inspection."""
    decision = {
        "threshold_pairs": DRIVER_CANON_MAX_PAIRS,
        "est_pairs": None,
        "route": None,
        "forced": distributed_canon is not None,
    }
    if distributed_canon is None:
        # dedup is materialized -> count() is metadata, no execution.
        est_pairs = 2 * dedup.count()
        decision["est_pairs"] = est_pairs
        distributed_canon = est_pairs > DRIVER_CANON_MAX_PAIRS
    decision["route"] = "distributed" if distributed_canon else "driver"
    CANON_ROUTE.clear()
    CANON_ROUTE.update(decision)
    return decision


def kg_triples_dataset(
    sf_dir: str,
    models: Optional[Dict] = None,
    kb: Optional[InMemoryKB] = None,
    batch_size: int = 64,
    phase_barriers: bool = True,
    distributed_canon: Optional[bool] = None,
):
    """Full pipeline -> distinct canonical triples Dataset.

    The canonical mapping needs a global pass over distinct (surface, qid)
    pairs, so the raw triple stage is materialized first (triples are ~10^-2
    the input volume; for the checkpointed multi-partition job the same two
    phases run over the partition parquet files instead — see state/checkpoint).

    ``phase_barriers`` materializes the assembled documents before the
    extraction pool: on a single node the fused pool owns nearly every CPU,
    so streaming assembly into it starves the shuffle and serializes poorly —
    phase isolation is faster. On a large multi-node cluster with the
    checkpointed runner, partitions stream instead.

    ``distributed_canon`` switches the canonical mapping from the driver
    union-find + broadcast dict (bounded by vocabulary — right up to
    ~10^7 distinct surface/qid pairs) to the fully distributed
    connected-components + hash-join path (stages/canonicalize.py
    ``build_canonical_mapping_dataset`` / ``canonicalize_triples_joined``),
    which never materializes the pair set on one machine. Output is
    byte-identical (tested). Default ``None`` AUTO-ROUTES on an upper-bound
    pair estimate vs ``DRIVER_CANON_MAX_PAIRS`` (r3 VERDICT #2) — the
    broadcast path wins below vocabulary scale (two extra corpus joins cost
    more than they save), the distributed path is mandatory past the driver
    memory bound; the decision lands in ``CANON_ROUTE`` and checkpoint
    lineage.
    """
    kb = kb or tdata.build_kb()
    docs = documents_dataset(sf_dir, max_doc_turns=MAX_DOC_TURNS)
    if phase_barriers:
        docs = docs.materialize()
    # Materialized barrier after the extraction pool: the dedup shuffle then
    # gets the whole node instead of competing with the actor pool.
    raw_triples = kg_raw_triples_dataset(
        sf_dir, models, kb, batch_size, docs=docs
    ).materialize()
    # Dedup BEFORE canonicalization: the canonical columns are a pure function
    # of (surface, qid), and EL assigns qids deterministically per surface, so
    # distinct-first shrinks every later pass. The distinct set is materialized
    # once; the mapping pass and the apply pass both read it.
    dedup = distinct_triples(raw_triples).materialize()
    if _route_canon(distributed_canon, dedup)["route"] == "distributed":
        from ..stages.canonicalize import (
            build_canonical_mapping_dataset,
            canonicalize_triples_joined,
        )

        mapping_ds = build_canonical_mapping_dataset(dedup, kb)
        canon = canonicalize_triples_joined(dedup, mapping_ds)
    else:
        mapping = build_canonical_mapping(dedup, kb)
        canon = canonicalize_triples(dedup, kb, mapping=mapping)
    return canon.select_columns(FINAL_COLUMNS)
