"""REL codec conformance (ported from
/root/reference/spacy_llm/tests/tasks/test_rel.py:239-290)."""

from spacy_llm_ray.tasks.rel import RelationItem, parse_rel_response, preannotate
from spacy_llm_ray.tokenizer import Span


def _span(start_char, end_char, label, text=""):
    return Span(0, 1, label, "", start_char, end_char, text)


def test_preannotate_format():
    # tests/tasks/test_rel.py:287-290: "Well[ENT0:A] hello[ENT1:B] there[ENT2:C]"
    text = "Well hello there"
    mentions = [
        _span(0, 4, "A", "Well"),
        _span(5, 10, "B", "hello"),
        _span(11, 16, "C", "there"),
    ]
    assert preannotate(text, mentions) == "Well[ENT0:A] hello[ENT1:B] there[ENT2:C]"


def test_preannotate_empty():
    assert preannotate("no entities here", []) == "no entities here"


def test_incorrect_indexing():
    # test_rel.py:239-270: dest index out of range -> dropped.
    line_ok = '{"dep": 0, "dest": 0, "relation": "LivesIn"}'
    line_bad = '{"dep": 0, "dest": 1, "relation": "LivesIn"}'
    assert len(parse_rel_response(line_ok, n_ents=1)) == 1
    assert len(parse_rel_response(line_bad, n_ents=1)) == 0


def test_ent_prefix_coercion():
    # items.py:9-14: "ENT3" -> 3.
    out = parse_rel_response('{"dep": "ENT0", "dest": "ENT1", "relation": "X"}', 2)
    assert out == [RelationItem(dep=0, dest=1, relation="X")]


def test_invalid_json_lines_skipped():
    response = "\n".join(
        [
            "not json",
            '{"dep": 0, "dest": 1, "relation": "A"}',
            '{"dep": 0, "relation": "missing dest"}',
            '{"dep": "ENTx", "dest": 1, "relation": "bad index"}',
            '{"dep": 1, "dest": 0, "relation": "B"}',
        ]
    )
    out = parse_rel_response(response, n_ents=2)
    assert out == [
        RelationItem(dep=0, dest=1, relation="A"),
        RelationItem(dep=1, dest=0, relation="B"),
    ]


def _explode_batch(rows):
    import pyarrow as pa

    from spacy_llm_ray.stages.schemas import MENTION_TYPE, REL_TYPE

    def m(text):
        return {"text": text, "label": "X", "kb_id": "NIL",
                "start_char": 0, "end_char": len(text),
                "start_tok": 0, "end_tok": 1}

    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "mentions": pa.array(
            [[m(t) for t in r[1]] if r[1] is not None else None for r in rows],
            type=pa.list_(MENTION_TYPE),
        ),
        "rel": pa.array([r[2] for r in rows], type=pa.list_(REL_TYPE)),
    })


def test_explode_triples_null_mentions_row():
    """A null mentions list (e.g. parquet round-trip of an empty row) must
    not poison the flattened offsets of LATER rows."""
    from spacy_llm_ray.stages.triples import explode_triples

    batch = _explode_batch([
        ("c0", ["a", "b"], [{"dep": 0, "dest": 1, "relation": "R"}]),
        ("c1", None, []),
        ("c2", ["x", "y"], [{"dep": 1, "dest": 0, "relation": "S"}]),
    ])
    out = explode_triples(batch).to_pylist()
    assert [(r["conv_id"], r["subj"], r["obj"]) for r in out] == [
        ("c0", "a", "b"), ("c2", "y", "x"),
    ]


def test_explode_triples_out_of_range_index_raises():
    """An out-of-range mention index must fail loudly, never gather a
    neighboring document's mention."""
    import pytest

    from spacy_llm_ray.stages.triples import explode_triples

    batch = _explode_batch([
        ("c0", ["a", "b"], [{"dep": 0, "dest": 2, "relation": "R"}]),
        ("c1", ["c"], []),
    ])
    with pytest.raises(IndexError, match="out of range"):
        explode_triples(batch)
