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
    conv_ids = batch["conv_id"].to_pylist()
    mentions_lists = batch["mentions"].to_pylist()
    rel_lists = batch["rel"].to_pylist()

    cols: dict = {name: [] for name in TRIPLE_SCHEMA.names}
    for conv_id, mentions, rels in zip(conv_ids, mentions_lists, rel_lists):
        for r in rels:
            subj = mentions[r["dep"]]
            obj = mentions[r["dest"]]
            cols["conv_id"].append(conv_id)
            cols["subj"].append(subj["text"])
            cols["subj_label"].append(subj["label"])
            cols["subj_qid"].append(subj["kb_id"])
            cols["pred"].append(r["relation"])
            cols["obj"].append(obj["text"])
            cols["obj_label"].append(obj["label"])
            cols["obj_qid"].append(obj["kb_id"])
    return pa.table(cols, schema=TRIPLE_SCHEMA)
