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
    """Actor-pool sizing: autoscaling (1, max) bounded by cluster CPUs so
    three concurrent LLM pools + read/write stages share the node."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, int(cpus * frac)))


def transcripts_dataset(sf_dir: str, columns=None):
    """Synthesize (once) + read the transcript table for a scale factor.
    ``sf_dir`` is a testdata dir (basename sf*) or a generated-data dir."""
    import ray.data

    data_dir = tdata.ensure_dataset(sf_dir)
    return ray.data.read_parquet(
        f"{data_dir}/transcripts.parquet",
        columns=columns or ["conv_id", "turn_idx", "role", "text"],
    )


def documents_dataset(sf_dir: str):
    return assemble_documents(transcripts_dataset(sf_dir))


def kg_mentions_dataset(sf_dir: str, models: Optional[Dict] = None, batch_size: int = 64):
    models = models or default_models()
    docs = documents_dataset(sf_dir)
    return docs.map_batches(
        NerStage,
        fn_constructor_kwargs=dict(labels=LABELS_NER, model=models["ner"]),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(),
        num_cpus=1,
    )


def kg_relations_dataset(sf_dir: str, models: Optional[Dict] = None, batch_size: int = 64):
    models = models or default_models()
    mentions = kg_mentions_dataset(sf_dir, models, batch_size)
    return mentions.map_batches(
        RelStage,
        fn_constructor_kwargs=dict(labels=LABELS_REL, model=models["rel"]),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(),
        num_cpus=1,
    )


def kg_linked_dataset(
    sf_dir: str,
    models: Optional[Dict] = None,
    kb: Optional[InMemoryKB] = None,
    batch_size: int = 64,
):
    import ray

    models = models or default_models()
    kb_ref = ray.put(kb or tdata.build_kb())
    rels = kg_relations_dataset(sf_dir, models, batch_size)
    return rels.map_batches(
        ElStage,
        fn_constructor_kwargs=dict(kb=kb_ref, model=models["el"]),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(),
        num_cpus=1,
    )


def distinct_triples(triples_ds, keys=("conv_id", "subj", "pred", "obj")):
    """Exact dedup: hash-partition on the key, first row per group
    (SURVEY.md §2.7)."""
    return triples_ds.groupby(list(keys)).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


FINAL_COLUMNS = [
    "conv_id", "subj", "pred", "obj",
    "subj_qid", "obj_qid", "subj_canon", "obj_canon",
]


def kg_triples_dataset(
    sf_dir: str,
    models: Optional[Dict] = None,
    kb: Optional[InMemoryKB] = None,
    batch_size: int = 64,
):
    """Full pipeline -> distinct canonical triples Dataset.

    The canonical mapping needs a global pass over distinct (surface, qid)
    pairs, so the raw triple stage is materialized first (triples are ~10^-2
    the input volume; for the checkpointed multi-partition job the same two
    phases run over the partition parquet files instead — see state/checkpoint).
    """
    kb = kb or tdata.build_kb()
    linked = kg_linked_dataset(sf_dir, models, kb, batch_size)
    raw_triples = linked.map_batches(explode_triples, batch_format="pyarrow").materialize()
    mapping = build_canonical_mapping(raw_triples, kb)
    canon = canonicalize_triples(raw_triples, kb, mapping=mapping)
    return distinct_triples(canon).select_columns(FINAL_COLUMNS)
