"""Canonicalization: connected components over surface-form equivalence.

The reference's closest analogue is label normalization
(/root/reference/spacy_llm/registry/normalizer.py:6-29); the north rule
requires full entity canonicalization: surfaces that share a linked KB id (or
a normalized surface form) merge into one canonical entity, with a
deterministic min-ID representative.

Distributed shape (SURVEY.md §2.7): the *distinct* (surface, qid) pair set is
many orders of magnitude smaller than the triple table (bounded by vocabulary,
not data volume), so we:

1. extract per-batch-deduped (surface, qid) pairs with ``map_batches``
   (a partial/combiner aggregation — the shuffle only moves distinct pairs),
2. collect the small distinct set to the driver,
3. run union-find there (nodes: normalized surfaces + qids; edges: links),
4. broadcast the resulting surface->canonical dict back through ``ray.put``
   and map it over the triple table — no join shuffle.

Component representative: smallest qid (numeric-aware) -> its KB name; pure
NIL components: smallest original surface.
"""

from __future__ import annotations

from typing import Dict, Tuple

import pyarrow as pa

from ..kb import InMemoryKB
from ..normalizers import lowercase_normalizer
from ..tasks.entity_linker import NIL


def _extract_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch-deduped (surface, qid) pairs — vectorized combiner."""
    import pandas as pd

    frames = [
        pd.DataFrame(
            {
                "surface": batch[side].to_pandas(),
                "qid": batch[f"{side}_qid"].to_pandas().fillna(NIL).replace("", NIL),
            }
        )
        for side in ("subj", "obj")
    ]
    pairs = pd.concat(frames).drop_duplicates().sort_values(["surface", "qid"])
    from .arrow_utils import df_table

    return df_table(pairs)


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # Deterministic: smaller string becomes the root.
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _qid_sort_key(qid: str):
    if qid.startswith("Q") and qid[1:].isdigit():
        return (0, int(qid[1:]), qid)
    return (1, 0, qid)


def build_canonical_mapping(
    triples_ds, kb: InMemoryKB
) -> Dict[str, Tuple[str, str]]:
    """surface -> (canonical id, canonical name) from the distinct
    (surface, qid) pairs of a triples Dataset."""
    distinct = set()
    # Per-batch dedup happened in _extract_pairs; final dedup on the driver
    # over the (small) union of distinct pairs.
    for b in triples_ds.map_batches(_extract_pairs, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        distinct.update(zip(b["surface"].to_pylist(), b["qid"].to_pylist()))

    uf = _UnionFind()
    for surface, qid in sorted(distinct):
        snode = "s:" + lowercase_normalizer(surface)
        uf.find(snode)
        if qid != NIL:
            uf.union(snode, "q:" + qid)

    # Gather members per component.
    comp_qids: Dict[str, set] = {}
    comp_surfaces: Dict[str, set] = {}
    for surface, qid in sorted(distinct):
        root = uf.find("s:" + lowercase_normalizer(surface))
        comp_surfaces.setdefault(root, set()).add(surface)
        if qid != NIL:
            comp_qids.setdefault(root, set()).add(qid)

    mapping: Dict[str, Tuple[str, str]] = {}
    for root, surfaces in comp_surfaces.items():
        qids = comp_qids.get(root, set())
        if qids:
            canon_qid = min(qids, key=_qid_sort_key)
            canon_name = kb.get_entity_name(canon_qid) or min(surfaces)
            canon_id = canon_qid
        else:
            canon_name = min(surfaces)
            canon_id = "S:" + lowercase_normalizer(canon_name)
        for surface in surfaces:
            mapping[surface] = (canon_id, canon_name)
    return mapping


# Worker-process-level cache of fetched/split mappings keyed by ObjectRef:
# the apply stage runs as plain tasks (no actor-pool startup cost), and each
# reused worker process deserializes the broadcast dict exactly once.
_MAPPING_CACHE: Dict = {}


def _split_mapping(mapping_ref):
    try:
        import ray

        if isinstance(mapping_ref, ray.ObjectRef):
            cached = _MAPPING_CACHE.get(mapping_ref)
            if cached is not None:
                return cached
            mapping = ray.get(mapping_ref)
            split = (
                {s: c[0] for s, c in mapping.items()},
                {s: c[1] for s, c in mapping.items()},
            )
            _MAPPING_CACHE[mapping_ref] = split
            return split
    except ImportError:
        pass
    return (
        {s: c[0] for s, c in mapping_ref.items()},
        {s: c[1] for s, c in mapping_ref.items()},
    )


def _apply_canonical(batch: pa.Table, mapping_ref=None) -> pa.Table:
    id_map, name_map = _split_mapping(mapping_ref)
    for side in ("subj", "obj"):
        surfaces = batch[side].to_pandas()
        ids = surfaces.map(id_map)
        names = surfaces.map(name_map)
        missing = ids.isna()
        if missing.any():
            fallback = surfaces[missing]
            ids.loc[missing] = fallback.map(lambda s: "S:" + lowercase_normalizer(s))
            names.loc[missing] = fallback
        batch = batch.append_column(f"{side}_canon_id", pa.array(ids.tolist()))
        batch = batch.append_column(f"{side}_canon", pa.array(names.tolist()))
    return batch


def canonicalize_triples(triples_ds, kb: InMemoryKB, mapping=None):
    """Append subj_canon/obj_canon (+ canonical ids) to a triples Dataset.

    The mapping is computed from the dataset itself unless provided. NOTE:
    computing it consumes ``triples_ds`` once — pass a re-readable dataset or
    a precomputed mapping in streaming contexts.
    """
    import ray

    if mapping is None:
        mapping = build_canonical_mapping(triples_ds, kb)
    ref = ray.put(mapping)
    return triples_ds.map_batches(
        _apply_canonical,
        fn_kwargs={"mapping_ref": ref},
        batch_format="pyarrow",
    )
