"""End-to-end KG pipeline: P/R vs generator gold (target >= 0.95 per the
north rule; the deterministic mock stack achieves 1.0), stage outputs,
sharding of the giant conversation."""

import pyarrow.parquet as pq
import pytest

from spacy_llm_ray.data import ensure_dataset
from spacy_llm_ray.pipelines import kg


@pytest.fixture(scope="module")
def sf_dir(ray_session):
    return ensure_dataset("sf0.001")


def test_triples_match_gold(sf_dir):
    got = kg.kg_triples_dataset(sf_dir).to_pandas()
    gold = pq.read_table(f"{sf_dir}/gold_triples.parquet").to_pandas()[list(got.columns)]
    g1 = set(map(tuple, got.values))
    g2 = set(map(tuple, gold.values))
    tp = len(g1 & g2)
    precision = tp / len(g1)
    recall = tp / len(g2)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # The mock stack is deterministic and exact:
    assert precision == 1.0 and recall == 1.0


def test_mentions_stage(sf_dir):
    ds = kg.kg_mentions_dataset(sf_dir)
    row = ds.take(1)[0]
    assert {m["label"] for ms in [row["mentions"]] for m in ms} <= {"PERSON", "GPE", "ORG"}
    for m in row["mentions"]:
        assert row["text"][m["start_char"]:m["end_char"]] == m["text"]


def test_linked_stage_nil_semantics(sf_dir):
    ds = kg.kg_linked_dataset(sf_dir)
    rows = ds.take(20)
    kb_persons = set("Alice Johnson Bob Stone Carol Mendez David Okafor".split("  "))
    saw_nil = saw_linked = False
    for row in rows:
        for m in row["mentions"]:
            assert m["kb_id"], "every mention must carry a kb_id or NIL"
            if m["kb_id"] == "NIL":
                saw_nil = True
            else:
                saw_linked = True
    assert saw_linked  # NIL presence depends on the sample; linked must occur


def test_sharding_in_pipeline(sf_dir):
    """The head conversation at sf0.001 is ~136 turns (~9k chars); with the
    default context length of 4097 it still fits unsharded, so force a small
    context to verify the in-stage shard path end to end."""
    models = kg.default_models(context_length=256)
    got = kg.kg_triples_dataset(sf_dir, models=models).to_pandas()
    gold = pq.read_table(f"{sf_dir}/gold_triples.parquet").to_pandas()[list(got.columns)]
    g1 = set(map(tuple, got.values))
    g2 = set(map(tuple, gold.values))
    tp = len(g1 & g2)
    # Sharding may lose relations whose subject and object fall in different
    # shards, and EL may NIL mentions straddling a shard boundary (the
    # reference has the same properties). The EL fit check sizes shards with
    # the real candidate block (ADVICE r1), so the forced 256-token context
    # yields a few more boundary NILs than the gold (unsharded-EL) fixture.
    assert tp / len(g1) >= 0.98
    assert tp / len(g2) >= 0.9
