"""Determinism: two executions of the flagship pipeline over the same input
produce identical triple sets (north rule: runs must be reproducible despite
nondeterministic actor/block scheduling — all outputs are keyed, never
order-dependent)."""

import pytest

from spacy_llm_ray.data import ensure_dataset, generate_transcripts
from spacy_llm_ray.pipelines import kg


def test_generator_byte_stable():
    a = generate_transcripts(1200)
    b = generate_transcripts(1200)
    assert a.equals(b)


def test_pipeline_runs_identical(ray_session):
    sf = ensure_dataset("sf0.001")
    run1 = set(map(tuple, kg.kg_triples_dataset(sf).to_pandas()[kg.FINAL_COLUMNS].values))
    run2 = set(map(tuple, kg.kg_triples_dataset(sf).to_pandas()[kg.FINAL_COLUMNS].values))
    assert run1 == run2 and len(run1) > 0
