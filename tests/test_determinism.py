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


def test_ensure_dataset_regenerates_stale_marker_dir(tmp_path):
    """A dataset dir carrying a pre-v2 _COMPLETE marker is regenerated when
    its basename names a known scale factor (the pre-existing name-flow
    behavior); only a non-resolvable custom dir raises."""
    import os

    import pytest

    from spacy_llm_ray.data.transcripts import ensure_dataset

    stale = tmp_path / "turns600"
    stale.mkdir()
    (stale / "_COMPLETE").write_text("format=v1")
    out = ensure_dataset(str(stale), base_dir=str(tmp_path))
    assert out == str(stale)
    assert "format=v2" in (stale / "_COMPLETE").read_text()
    assert os.path.exists(os.path.join(out, "transcripts.parquet"))

    custom = tmp_path / "my_custom_corpus"
    custom.mkdir()
    (custom / "_COMPLETE").write_text("format=v1")
    with pytest.raises(ValueError, match="incompatible format marker"):
        ensure_dataset(str(custom), base_dir=str(tmp_path))
