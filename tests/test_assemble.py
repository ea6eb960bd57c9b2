"""Document assembly: per-turn text equality under stable (conv_id, turn_idx)
ordering (the north-rule invariant), salted two-stage shuffle correctness."""

import pyarrow.parquet as pq
import pytest

from spacy_llm_ray.data import ensure_dataset
from spacy_llm_ray.stages.assemble import SALT_BUCKET_TURNS, TURN_SEP


@pytest.fixture(scope="module")
def docs_and_transcripts(ray_session):
    import ray.data

    from spacy_llm_ray.pipelines.kg import documents_dataset

    data_dir = ensure_dataset("sf0.001")
    docs = {d["conv_id"]: d for d in documents_dataset(data_dir).take_all()}
    transcripts = pq.read_table(f"{data_dir}/transcripts.parquet")
    return docs, transcripts


def test_per_turn_text_equality(docs_and_transcripts):
    docs, transcripts = docs_and_transcripts
    rows = transcripts.to_pylist()
    n_checked = 0
    for r in rows:
        doc = docs[r["conv_id"]]
        off = next(o for o in doc["turn_offsets"] if o["turn_idx"] == r["turn_idx"])
        assert doc["text"][off["start_char"]:off["end_char"]] == r["text"]
        assert off["role"] == r["role"]
        n_checked += 1
    assert n_checked == transcripts.num_rows


def test_turn_order_and_counts(docs_and_transcripts):
    docs, transcripts = docs_and_transcripts
    import collections

    lens = collections.Counter(transcripts["conv_id"].to_pylist())
    assert len(docs) == len(lens)
    for conv_id, doc in docs.items():
        idxs = [o["turn_idx"] for o in doc["turn_offsets"]]
        assert idxs == sorted(idxs) == list(range(lens[conv_id]))
        assert doc["n_turns"] == lens[conv_id]
        # Separators account for full text length.
        turn_len = sum(o["end_char"] - o["start_char"] for o in doc["turn_offsets"])
        assert len(doc["text"]) == turn_len + (doc["n_turns"] - 1) * len(TURN_SEP)


def test_salting_exercised(docs_and_transcripts):
    # The head conversation must be long enough to span multiple salt buckets,
    # otherwise the two-stage merge path is untested.
    docs, _ = docs_and_transcripts
    assert max(d["n_turns"] for d in docs.values()) > SALT_BUCKET_TURNS // 4
