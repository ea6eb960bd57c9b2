"""EntityLinker codec conformance (response format from
/root/reference/spacy_llm/tests/tasks/test_entity_linker.py:509-558, guard
from tasks/entity_linker/task.py:211-236)."""

from spacy_llm_ray.kb import InMemoryKB, kb_from_dicts
from spacy_llm_ray.tasks.entity_linker import (
    NIL,
    UNAVAILABLE_ENTITY_DESC,
    highlight_mentions,
    parse_el_solutions,
    resolve_el_response,
)
from spacy_llm_ray.tokenizer import Span


def _span(start_char, end_char, label, text):
    return Span(0, 1, label, "", start_char, end_char, text)


def test_parse_solutions():
    response = (
        "REASONING: stuff\n"
        "SOLUTION:\n"
        "*New York* ::: <Q60>\n"
        "*Big Apple* ::: <Q14435>\n"
        "*Apple* ::: <NIL>\n"
    )
    assert parse_el_solutions(response) == ["Q60", "Q14435", "NIL"]


def test_highlight():
    text = "Alice goes to Boston to see the Boston Celtics game."
    mentions = [
        _span(14, 20, "GPE", "Boston"),
        _span(32, 46, "ORG", "Boston Celtics"),
    ]
    assert (
        highlight_mentions(text, mentions)
        == "Alice goes to *Boston* to see the *Boston Celtics* game."
    )
    # Only the second mention included in the prompt:
    assert (
        highlight_mentions(text, mentions, [False, True])
        == "Alice goes to Boston to see the *Boston Celtics* game."
    )


def test_resolution_guard():
    ments = [_span(0, 1, "X", "a"), _span(2, 3, "X", "b"), _span(4, 5, "X", "c")]
    has_cands = [True, False, True]
    # Happy path: 2 solutions + 1 auto-NIL == 3 mentions.
    out = resolve_el_response(ments, has_cands, ["Q1", "NIL"])
    assert [s.kb_id for s in out] == ["Q1", NIL, NIL]
    # Mismatch: only 1 solution -> everything NIL (task.py:211-236).
    out = resolve_el_response(ments, has_cands, ["Q1"])
    assert [s.kb_id for s in out] == [NIL, NIL, NIL]


def test_kb_candidates():
    kb = kb_from_dicts(
        {
            "Q100": {"name": "Boston", "desc": "city in Massachusetts"},
            "Q131371": {"name": "Boston Celtics", "desc": "NBA team"},
            "Q204289": {"name": "Boston (band)", "desc": "American rock band"},
        },
        [
            {
                "alias": "Boston",
                "entities": ["Q100", "Q204289"],
                "probabilities": [0.7, 0.2],
            },
            {"alias": "Boston Celtics", "entities": ["Q131371"], "probabilities": [1.0]},
        ],
    )
    cands = kb.get_candidates("Boston")
    assert [c.id for c in cands] == ["Q100", "Q204289"]  # sorted by prior desc
    assert cands[0].description == "city in Massachusetts"
    # Unknown alias -> NIL placeholder (candidate_selector.py:58).
    nil = kb.get_candidates("Nowhere")
    assert [c.id for c in nil] == [NIL]
    assert nil[0].description == UNAVAILABLE_ENTITY_DESC
    # top_n truncation
    assert len(kb.get_candidates("Boston", top_n=1)) == 1


def test_kb_unknown_alias_entity_raises():
    kb = InMemoryKB()
    kb.add_entity("Q1", "One", "first")
    try:
        kb.add_alias("one", ["Q2"], [1.0])
        assert False, "expected ValueError"
    except ValueError:
        pass
