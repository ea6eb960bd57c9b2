"""Explode (mentions, rel) document rows into candidate triple rows.

The reference stops at ``Doc._.rel`` index pairs
(/root/reference/spacy_llm/tasks/rel/items.py:4-14); the KG pipeline joins
those indices to mention surface forms / KB ids to emit
(subj, pred, obj) rows (SURVEY.md §1.1 RelationItem mapping).
Stateless, vectorizable-enough map_batches fn: row cardinality changes, so a
fresh table is built per batch.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from .schemas import MENTION_TYPE, REL_TYPE, TRIPLE_SCHEMA  # noqa: F401


def explode_triples(batch: pa.Table) -> pa.Table:
    """Vectorized explode: flatten the rel lists, map each rel's (dep, dest)
    mention indices into the FLATTENED mentions space (per-row start offset
    + local index), and gather every output column with ``pc.take`` — no
    Python loop over rows or rels, and the mention structs are never
    converted to Python dicts."""
    import numpy as np
    import pyarrow.compute as pc

    rel_col = batch["rel"].combine_chunks()
    ment_col = batch["mentions"].combine_chunks()

    flat_rel = pc.list_flatten(rel_col)
    if len(flat_rel) == 0:
        return TRIPLE_SCHEMA.empty_table()
    parent = pc.list_parent_indices(rel_col)

    # Start offset of each row's mentions within the flattened mention array
    # (slice-safe: lengths, not raw buffer offsets). Null mention lists
    # contribute zero flattened values, so fill_null(0) is exact — without
    # it a single null row turns every later offset into NaN garbage.
    m_lens = (
        pc.fill_null(pc.list_value_length(ment_col), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    m_starts = np.zeros(len(m_lens) + 1, dtype=np.int64)
    np.cumsum(m_lens, out=m_starts[1:])
    parent_np = parent.to_numpy(zero_copy_only=False)
    rel_base = m_starts[parent_np]

    dep_arr, dest_arr = flat_rel.field("dep"), flat_rel.field("dest")
    if dep_arr.null_count or dest_arr.null_count:
        raise ValueError("rel rows with null dep/dest indices")
    dep = dep_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    dest = dest_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    # Loud failure on out-of-range mention indices (the old row loop raised
    # IndexError); in flattened space a bad index would otherwise silently
    # gather a NEIGHBORING document's mention.
    row_len = m_lens[parent_np]
    bad = (dep < 0) | (dep >= row_len) | (dest < 0) | (dest >= row_len)
    if bad.any():
        raise IndexError(
            f"rel mention index out of range in {int(bad.sum())} rel row(s)"
        )
    flat_m = pc.list_flatten(ment_col)
    subj = pc.take(flat_m, pa.array(rel_base + dep))
    obj = pc.take(flat_m, pa.array(rel_base + dest))
    conv = pc.take(batch["conv_id"].combine_chunks(), parent)

    return pa.table(
        {
            "conv_id": conv,
            "subj": subj.field("text"),
            "subj_label": subj.field("label"),
            "subj_qid": subj.field("kb_id"),
            "pred": flat_rel.field("relation"),
            "obj": obj.field("text"),
            "obj_label": obj.field("label"),
            "obj_qid": obj.field("kb_id"),
        },
        schema=TRIPLE_SCHEMA,
    )
