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


def test_kb_object_loader_requires_spacy():
    """kb_from_spacy_dir is import-gated on spacy (absent in this sandbox)."""
    import pytest

    from spacy_llm_ray.kb import kb_from_spacy_dir
    from spacy_llm_ray.registry import get_misc

    try:
        import spacy  # noqa: F401

        pytest.skip("spacy installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="kb_from_spacy_dir requires spacy"):
        kb_from_spacy_dir("/tmp/nonexistent_kb_dir")
    # The registry resolves the reference's name to the gated loader.
    assert get_misc("spacy.KBObjectLoader.v1") is not None


def test_kb_object_loader_conversion_with_fake_spacy(monkeypatch, tmp_path):
    """Conversion logic from a spaCy InMemoryLookupKB to the engine KB,
    driven by a fake spacy module (mirrors the fakes-driven HF tests)."""
    import sys
    import types

    class _Cand:
        def __init__(self, qid, prior):
            self.entity_ = qid
            self.prior_prob = prior

    class _FakeLookupKB:
        def __init__(self, vocab, entity_vector_length=1):
            pass

        def from_disk(self, path):
            self._loaded = str(path)

        def get_entity_strings(self):
            return ["Q2", "Q60"]

        def get_alias_strings(self):
            return ["Acme"]

        def get_alias_candidates(self, alias):
            return [_Cand("Q2", 0.9), _Cand("Q60", 0.1)]

    fake_spacy = types.ModuleType("spacy")
    fake_spacy.load = lambda p: types.SimpleNamespace(vocab=object())
    fake_kb_mod = types.ModuleType("spacy.kb")
    fake_kb_mod.InMemoryLookupKB = _FakeLookupKB
    fake_spacy.kb = fake_kb_mod
    monkeypatch.setitem(sys.modules, "spacy", fake_spacy)
    monkeypatch.setitem(sys.modules, "spacy.kb", fake_kb_mod)

    desc = tmp_path / "descs.csv"
    desc.write_text("Q2;Acme Corp manufacturer\nQ60;NYC\n")

    from spacy_llm_ray.kb import kb_from_spacy_dir

    kb = kb_from_spacy_dir(
        str(tmp_path / "kb"), nlp_path=str(tmp_path), desc_path=str(desc)
    )
    assert set(kb.entities) == {"Q2", "Q60"}
    assert kb.get_entity_description("Q2") == "Acme Corp manufacturer"
    cands = kb.get_candidates("Acme", top_n=2)
    assert [c.id for c in cands] == ["Q2", "Q60"]
