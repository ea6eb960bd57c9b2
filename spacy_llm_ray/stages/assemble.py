"""Document assembly: transcripts -> turn-ordered documents.

The one unavoidable all-to-all shuffle in the KG pipeline. Turns are grouped
by conversation and concatenated in (turn_idx) order with ``\\n`` separators,
recording per-turn char offsets so the per-turn text-equality invariant (the
north rule) is checkable on the assembled document.

Skew handling (SURVEY.md §4): conversation lengths are Zipf-skewed — one
conversation can be orders of magnitude longer than the median. A naive
``groupby(conv_id)`` sends every turn of the monster conversation to one
worker. We therefore shuffle in two stages:

1. salt = turn_idx // SALT_BUCKET_TURNS; ``groupby(conv_id, salt)`` assembles
   contiguous turn-range *segments* in parallel (bounded group size),
2. ``groupby(conv_id)`` merges the (few, large) segments in salt order,
   shifting char offsets.

At 100 TB this caps per-group memory in stage 1 at SALT_BUCKET_TURNS turns
and makes stage 2 groups proportional to n_turns / SALT_BUCKET_TURNS.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc

SALT_BUCKET_TURNS = 512
TURN_SEP = "\n"

TURN_OFFSET_TYPE = pa.struct(
    [
        ("turn_idx", pa.int32()),
        ("start_char", pa.int32()),
        ("end_char", pa.int32()),
        ("role", pa.string()),
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int32()),
        ("text", pa.string()),
        ("turn_offsets", pa.list_(TURN_OFFSET_TYPE)),
    ]
)


def _add_salt(batch: pa.Table) -> pa.Table:
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), SALT_BUCKET_TURNS)),
        pa.int32(),
    )
    return batch.append_column("salt", salt)


def _assemble_rows(texts: List[str], turn_idxs: List[int], roles: List[str]):
    """Concat turn texts with separators; emit per-turn offset structs."""
    parts: List[str] = []
    offsets = []
    cursor = 0
    for i, (t, ti, role) in enumerate(zip(texts, turn_idxs, roles)):
        if i > 0:
            cursor += len(TURN_SEP)
        parts.append(t)
        offsets.append(
            {
                "turn_idx": ti,
                "start_char": cursor,
                "end_char": cursor + len(t),
                "role": role,
            }
        )
        cursor += len(t)
    return TURN_SEP.join(parts), offsets


def _segment_group(group: pa.Table) -> pa.Table:
    """One (conv_id, salt) group -> one contiguous segment row."""
    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    text, offsets = _assemble_rows(
        g["text"].to_pylist(), g["turn_idx"].to_pylist(), g["role"].to_pylist()
    )
    return pa.table(
        {
            "conv_id": [g["conv_id"][0].as_py()],
            "salt": pa.array([g["salt"][0].as_py()], type=pa.int32()),
            "n_turns": pa.array([g.num_rows], type=pa.int32()),
            "text": [text],
            "turn_offsets": pa.array([offsets], type=pa.list_(TURN_OFFSET_TYPE)),
        }
    )


def _merge_group(group: pa.Table) -> pa.Table:
    """One conv_id group of segments -> one document row (salt order)."""
    order = pc.sort_indices(group, sort_keys=[("salt", "ascending")])
    g = group.take(order)
    texts = g["text"].to_pylist()
    all_offsets = g["turn_offsets"].to_pylist()
    merged_offsets = []
    shift = 0
    for i, (t, offs) in enumerate(zip(texts, all_offsets)):
        if i > 0:
            shift += len(TURN_SEP)
        for o in offs:
            merged_offsets.append(
                {
                    "turn_idx": o["turn_idx"],
                    "start_char": o["start_char"] + shift,
                    "end_char": o["end_char"] + shift,
                    "role": o["role"],
                }
            )
        shift += len(t)
    return pa.table(
        {
            "conv_id": [g["conv_id"][0].as_py()],
            "n_turns": pa.array([int(pc.sum(g["n_turns"]).as_py())], type=pa.int32()),
            "text": [TURN_SEP.join(texts)],
            "turn_offsets": pa.array([merged_offsets], type=pa.list_(TURN_OFFSET_TYPE)),
        }
    )


def assemble_documents(transcripts) -> "ray.data.Dataset":  # noqa: F821
    """transcripts Dataset -> documents Dataset (conv_id, n_turns, text,
    turn_offsets). Only (conv_id, turn_idx, role, text) are consumed — project
    before calling for maximal read pruning."""
    ds = transcripts.map_batches(_add_salt, batch_format="pyarrow")
    segments = ds.groupby(["conv_id", "salt"]).map_groups(
        _segment_group, batch_format="pyarrow"
    )
    return segments.groupby("conv_id").map_groups(_merge_group, batch_format="pyarrow")
