"""Document assembly: transcripts -> turn-ordered documents.

The one unavoidable all-to-all shuffle in the KG pipeline. Turns are grouped
by conversation and concatenated in (turn_idx) order with ``\\n`` separators,
recording per-turn char offsets so the per-turn text-equality invariant (the
north rule) is checkable on the assembled document.

Partitioning/skew design (SURVEY.md §4):

- The shuffle key is a *hash bucket*, not the raw conv_id: ``groupby(bucket)``
  produces O(num_buckets) groups, and the per-group UDF processes *all*
  conversations of the bucket with one vectorized pandas pass — avoiding
  Ray's per-group UDF overhead on millions of tiny conversation groups.
- Zipf skew (one monster conversation) is handled by salting stage 1:
  bucket1 = hash(conv_id, turn_idx // SALT_BUCKET_TURNS), so a giant
  conversation's turns are assembled as bounded contiguous *segments* on many
  workers; stage 2 (bucket2 = hash(conv_id)) merges the few large segments
  per conversation in salt order.
- num_buckets scales with the cluster (buckets ≈ 4 × CPUs here; at 100 TB,
  thousands), keeping each group's memory bounded at
  (turns/bucket) × row size.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

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


def _default_num_buckets() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(16, int(ray.cluster_resources().get("CPU", 8)) * 4)
    except ImportError:
        pass
    return 32


def _assemble_rows(texts, turn_idxs, roles):
    """Concat turn texts (already turn-ordered) with separators; emit
    per-turn offset structs."""
    offsets = []
    cursor = 0
    for i, (t, ti, role) in enumerate(zip(texts, turn_idxs, roles)):
        if i > 0:
            cursor += len(TURN_SEP)
        offsets.append(
            {
                "turn_idx": int(ti),
                "start_char": cursor,
                "end_char": cursor + len(t),
                "role": role,
            }
        )
        cursor += len(t)
    return TURN_SEP.join(texts), offsets


class _AddBuckets:
    """Adds stage-1 (conv, salt-range) and stage-2 (conv) hash buckets."""

    def __init__(self, num_buckets: int, salt_turns: int = SALT_BUCKET_TURNS):
        self._n = num_buckets
        self._salt_turns = salt_turns

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized row hash (fixed hash_key => deterministic within a run;
        # bucket assignment only affects shuffle balance, never output).
        h = pd.util.hash_pandas_object(
            batch["conv_id"].to_pandas(), index=False
        ).to_numpy()
        turn_idx = batch["turn_idx"].to_numpy(zero_copy_only=False)
        salts = turn_idx // self._salt_turns
        b1 = ((h ^ (salts.astype(np.uint64) * np.uint64(0x9E3779B1))) % self._n).astype(
            np.int32
        )
        return batch.append_column("bucket1", pa.array(b1)).append_column(
            "salt", pa.array(salts.astype(np.int32))
        )


def _segment_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One stage-1 bucket: assemble every (conv_id, salt) segment it holds."""
    g = group.sort_values(["conv_id", "salt", "turn_idx"], kind="mergesort")
    convs = g["conv_id"].to_numpy()
    salts = g["salt"].to_numpy()
    # Boundaries where (conv_id, salt) changes:
    change = np.flatnonzero((convs[1:] != convs[:-1]) | (salts[1:] != salts[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(g)]))
    texts = g["text"].to_numpy()
    idxs = g["turn_idx"].to_numpy()
    roles = g["role"].to_numpy()
    out = {"conv_id": [], "salt": [], "n_turns": [], "text": [], "turn_offsets": []}
    for s, e in zip(starts, ends):
        text, offsets = _assemble_rows(texts[s:e], idxs[s:e], roles[s:e])
        out["conv_id"].append(convs[s])
        out["salt"].append(int(salts[s]))
        out["n_turns"].append(int(e - s))
        out["text"].append(text)
        out["turn_offsets"].append(offsets)
    return pd.DataFrame(out)


class _AddMergeBucket:
    def __init__(self, num_buckets: int):
        self._n = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["conv_id"].to_pandas(), index=False
        ).to_numpy()
        b2 = pa.array((h % self._n).astype(np.int32), type=pa.int32())
        return batch.append_column("bucket2", b2)


def _merge_bucket(group: pd.DataFrame) -> pa.Table:
    """One stage-2 bucket: merge each conversation's segments in salt order,
    shifting char offsets."""
    g = group.sort_values(["conv_id", "salt"], kind="mergesort")
    convs = g["conv_id"].to_numpy()
    change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(g)]))
    texts = g["text"].to_numpy()
    n_turns = g["n_turns"].to_numpy()
    offsets_col = g["turn_offsets"].to_numpy()
    out_conv: List[str] = []
    out_turns: List[int] = []
    out_text: List[str] = []
    out_offsets: List[list] = []
    for s, e in zip(starts, ends):
        if e - s == 1:
            merged_offsets = list(offsets_col[s])
            text = texts[s]
        else:
            merged_offsets = []
            shift = 0
            for i in range(s, e):
                if i > s:
                    shift += len(TURN_SEP)
                for o in offsets_col[i]:
                    merged_offsets.append(
                        {
                            "turn_idx": o["turn_idx"],
                            "start_char": o["start_char"] + shift,
                            "end_char": o["end_char"] + shift,
                            "role": o["role"],
                        }
                    )
                shift += len(texts[i])
            text = TURN_SEP.join(texts[s:e])
        out_conv.append(convs[s])
        out_turns.append(int(n_turns[s:e].sum()))
        out_text.append(text)
        out_offsets.append(merged_offsets)
    return pa.table(
        {
            "conv_id": pa.array(out_conv),
            "n_turns": pa.array(out_turns, type=pa.int32()),
            "text": pa.array(out_text),
            "turn_offsets": pa.array(out_offsets, type=pa.list_(TURN_OFFSET_TYPE)),
        }
    )


def assemble_documents(
    transcripts,
    num_buckets: Optional[int] = None,
    max_doc_turns: Optional[int] = None,
):
    """transcripts Dataset -> documents Dataset (conv_id, n_turns, text,
    turn_offsets). Only (conv_id, turn_idx, role, text) are consumed — project
    before calling for maximal read pruning.

    ``max_doc_turns``: when set, a conversation is emitted as multiple
    *chunk* documents of at most that many contiguous turns (column
    ``chunk_idx`` = turn_idx // max_doc_turns). This is the north-rule cap on
    document length: one monster conversation becomes many independently
    processable rows, removing the straggler from the extraction pool.
    Relation locality is bounded to the chunk window — the same bound the
    context-length shard mapper already imposes within a document. The chunked
    path needs only ONE shuffle (the stage-2 segment merge disappears because
    stage-1 segments *are* the chunks)."""
    nb = num_buckets or _default_num_buckets()
    salt_turns = max_doc_turns or SALT_BUCKET_TURNS

    ds = transcripts.map_batches(
        _AddBuckets(nb, salt_turns), batch_format="pyarrow"
    )
    segments = ds.groupby("bucket1").map_groups(
        _segment_bucket, batch_format="pandas"
    )
    if max_doc_turns is not None:
        def finish(batch: pa.Table) -> pa.Table:
            idx = batch.schema.get_field_index("salt")
            batch = batch.set_column(
                idx, "chunk_idx", batch["salt"].cast(pa.int32())
            )
            # Drop the b'pandas' metadata the pandas->arrow conversion of
            # map_groups attaches: it makes pa.Schema unhashable and
            # disables Ray's schema dedup downstream (zero-copy strip).
            return batch.replace_schema_metadata(None)

        return segments.map_batches(finish, batch_format="pyarrow")
    segments = segments.map_batches(
        # strip + tag in one fused step (metadata note above)
        lambda t, _f=_AddMergeBucket(nb): _f(t).replace_schema_metadata(None),
        batch_format="pyarrow",
    )
    return segments.groupby("bucket2").map_groups(
        _merge_bucket, batch_format="pandas"
    ).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
