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
