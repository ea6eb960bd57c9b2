"""Readers (format fallback), example types, scoring, multimodal stubs."""

import json

import pytest

from spacy_llm_ray.readers import ent_desc_reader_csv, fewshot_reader, file_reader
from spacy_llm_ray.scoring import link_accuracy, span_prf, triple_prf
from spacy_llm_ray.tasks.examples import (
    ELExample,
    RELExample,
    SpanCoTExample,
    SpanExample,
)
from spacy_llm_ray.tokenizer import Span


def test_fewshot_reader_formats(tmp_path):
    data = [{"text": "Jack and Jill went up the hill.",
             "entities": {"PERSON": ["Jack", "Jill"], "LOCATION": ["hill"]}}]
    pj = tmp_path / "ex.json"
    pj.write_text(json.dumps(data))
    pl = tmp_path / "ex.jsonl"
    pl.write_text("\n".join(json.dumps(d) for d in data))
    py = tmp_path / "ex.yml"
    py.write_text(
        "- text: Jack and Jill went up the hill.\n"
        "  entities:\n    PERSON: [Jack, Jill]\n    LOCATION: [hill]\n"
    )
    for p in (pj, pl, py):
        exs = [SpanExample.from_dict(d) for d in fewshot_reader(p)]
        assert exs[0].entities["PERSON"] == ["Jack", "Jill"]


def test_fewshot_reader_wrong_suffix_fallback(tmp_path):
    # JSON content under .yml suffix still parses (format fallback,
    # reader.py:40-70 — YAML is a JSON superset, any format order works).
    p = tmp_path / "ex.yml"
    p.write_text(json.dumps([{"text": "t", "entities": {}}]))
    assert fewshot_reader(p)[0]["text"] == "t"


def test_fewshot_reader_garbage_raises(tmp_path):
    p = tmp_path / "ex.json"
    p.write_text(": not valid : anything [")
    with pytest.raises(ValueError):
        fewshot_reader(p)


def test_file_reader(tmp_path):
    p = tmp_path / "template.txt"
    p.write_text("  You are an expert.  \n")
    assert file_reader(p) == "You are an expert."


def test_ent_desc_reader(tmp_path):
    p = tmp_path / "desc.csv"
    p.write_text('Q1;"first thing"\nbadline\nQ2;second\n')
    descs = ent_desc_reader_csv(p)
    assert descs == {"Q1": "first thing", "Q2": "second"}
    empty = tmp_path / "empty.csv"
    empty.write_text("only-one-column\n")
    with pytest.raises(ValueError):
        ent_desc_reader_csv(empty)


def test_cot_example_roundtrip():
    d = {
        "text": "Jack and Jill went up the hill.",
        "spans": [
            {"text": "Jack", "is_entity": True, "label": "PERSON", "reason": "name"},
            {"text": "went up", "is_entity": False, "label": "==NONE==", "reason": "verb"},
        ],
    }
    ex = SpanCoTExample.from_dict(d)
    assert ex.spans[0].label == "PERSON" and ex.spans[1].is_entity is False


def test_rel_el_examples():
    rel = RELExample.from_dict(
        {"text": "Laura lives in Boston",
         "ents": [{"start_char": 0, "end_char": 5, "label": "PERSON"}],
         "relations": [{"dep": 0, "dest": 0, "relation": "LivesIn"}]}
    )
    assert rel.ents[0].label == "PERSON"
    el = ELExample.from_dict(
        {"text": "*Boston* is nice", "mentions": ["Boston"],
         "entity_descriptions": [["city"]], "entity_ids": [["Q100"]],
         "solutions": ["Q100"]}
    )
    assert el.mentions_str == "*Boston*"


def test_scoring():
    gold = [Span(0, 1, "A", "Q1", 0, 4, "x"), Span(2, 3, "B", "Q2", 10, 14, "y")]
    pred = [Span(0, 1, "A", "Q1", 0, 4, "x"), Span(4, 5, "B", "NIL", 20, 24, "z")]
    prf = span_prf(pred, gold)
    assert prf["ents_p"] == 0.5 and prf["ents_r"] == 0.5
    acc = link_accuracy(pred, gold)
    assert acc["link_accuracy"] == 0.5 and acc["n_links"] == 2
    t = triple_prf({("c", "a", "R", "b")}, {("c", "a", "R", "b"), ("c", "x", "R", "y")})
    assert t["p"] == 1.0 and t["r"] == 0.5


def test_multimodal_stubs(ray_session):
    import ray.data

    from spacy_llm_ray.stages.multimodal import (
        ImageDecodeStage,
        ImageFeatureStage,
        frame_sample_indices,
        make_fake_media_table,
    )

    tbl = make_fake_media_table(n=8)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=4, concurrency=1
    ).map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=4, concurrency=1
    )
    rows = out.take_all()
    assert len(rows) == 8
    assert len(rows[0]["pixels"]) == 16 * 16 * 3
    assert len(rows[0]["features"]) == 6
    assert rows[0]["meta"]["mime"] == "image/fake"
    # Deterministic decode
    r2 = ds.map_batches(ImageDecodeStage, batch_format="pyarrow", concurrency=1).take(1)[0]
    assert list(r2["pixels"]) == list(rows[0]["pixels"])
    # Strict mode surfaces the missing-codec contract.
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)
    assert frame_sample_indices(10, 3) == [0, 3, 6, 9]
