"""ElStage unit behaviors: sharded candidate re-selection, shard-straddler
auto-NIL, response-count guard."""

import pyarrow as pa
import pytest

from spacy_llm_ray.kb import kb_from_dicts
from spacy_llm_ray.models.mock import MockELModel, MockNERModel
from spacy_llm_ray.stages.llm_stage import ElStage, NerStage
from spacy_llm_ray.stages.schemas import MENTION_TYPE


def _mention(text, start, label, start_tok=0, end_tok=1):
    return {
        "start_char": start,
        "end_char": start + len(text),
        "start_tok": start_tok,
        "end_tok": end_tok,
        "label": label,
        "text": text,
        "kb_id": "",
    }


@pytest.fixture()
def kb():
    return kb_from_dicts(
        {
            "Q1": {"name": "Alice", "desc": "a person"},
            "Q100": {"name": "Boston", "desc": "a city"},
        },
        [
            {"alias": "Alice", "entities": ["Q1"], "probabilities": [0.9]},
            {"alias": "Boston", "entities": ["Q100"], "probabilities": [0.9]},
        ],
    )


def _batch(text, mentions):
    return pa.table(
        {
            "conv_id": ["c1"],
            "text": [text],
            "mentions": pa.array([mentions], type=pa.list_(MENTION_TYPE)),
        }
    )


def test_el_unsharded_links_and_auto_nils(kb):
    text = "Alice met Zorblat in Boston."
    mentions = [
        _mention("Alice", 0, "PERSON", 0, 1),
        _mention("Zorblat", 10, "PERSON", 2, 3),  # not in KB -> auto-NIL
        _mention("Boston", 21, "GPE", 4, 5),
    ]
    stage = ElStage(kb=kb, model=MockELModel(context_length=None))
    out = stage(_batch(text, mentions))
    got = [(m["text"], m["kb_id"]) for m in out["mentions"].to_pylist()[0]]
    assert got == [("Alice", "Q1"), ("Zorblat", "NIL"), ("Boston", "Q100")]


def test_el_sharded_links_per_shard(kb):
    # Tiny context forces sharding; each mention sits wholly inside a shard
    # and links via that shard's prompt (task.py:147-158 per-shard
    # candidate re-selection).
    filler = "and then some words follow here " * 20
    text = f"Alice was here. {filler}Boston was there."
    a = text.index("Alice")
    b = text.index("Boston")
    mentions = [
        _mention("Alice", a, "PERSON", 0, 1),
        _mention("Boston", b, "GPE", 30, 31),
    ]
    stage = ElStage(kb=kb, model=MockELModel(context_length=60))
    out = stage(_batch(text, mentions))
    got = {m["text"]: m["kb_id"] for m in out["mentions"].to_pylist()[0]}
    assert got == {"Alice": "Q1", "Boston": "Q100"}


def test_model_response_count_guard():
    class BrokenModel:
        context_length = None

        def __call__(self, prompts):
            return prompts[:-1]  # one short

    stage = NerStage(labels=["PERSON"], model=BrokenModel())
    with pytest.raises(ValueError, match="responses for"):
        stage(pa.table({"conv_id": ["c"], "text": ["Alice was here."]}))


def test_el_response_count_guard(kb):
    # ADVICE fix: ElStage enforces the same 1:1 prompt/response contract as
    # the other stages instead of silently zip-truncating.
    class BrokenModel:
        context_length = None

        def __call__(self, prompts):
            return []

    mentions = [_mention("Alice", 0, "PERSON", 0, 1)]
    stage = ElStage(kb=kb, model=BrokenModel())
    with pytest.raises(ValueError, match="responses for"):
        stage(_batch("Alice was here.", mentions))


def test_el_shard_probe_accounts_for_candidate_block(kb):
    # ADVICE fix: the shard-fit probe renders with the doc's full candidate
    # block. A mention-dense doc with a small context must split MORE than an
    # empty-block probe would conclude — every rendered EL prompt (text +
    # mention list + per-candidate descriptions) stays under context_length.
    from spacy_llm_ray.tasks.sharding import count_tokens_by_spaces

    text = "Alice met Boston. " * 6
    mentions = []
    off = 0
    for _ in range(6):
        mentions.append(_mention("Alice", off, "PERSON", 0, 1))
        mentions.append(_mention("Boston", off + 10, "GPE", 2, 3))
        off += len("Alice met Boston. ")

    seen_prompts = []

    class RecordingEL(MockELModel):
        def __call__(self, prompts):
            seen_prompts.extend(prompts)
            return super().__call__(prompts)

    ctx = 70
    stage = ElStage(kb=kb, model=RecordingEL(context_length=ctx))
    out = stage(_batch(text.rstrip(), mentions))
    got = {(m["text"], m["kb_id"]) for m in out["mentions"].to_pylist()[0]}
    assert got == {("Alice", "Q1"), ("Boston", "Q100")}
    assert len(seen_prompts) >= 2  # the candidate block forced a re-split
    for p in seen_prompts:
        assert count_tokens_by_spaces(p) <= ctx


def test_renderer_with_defaults_not_offset_called():
    """User renderers with default params must NOT receive the char offset
    (explicit accepts_offset opt-in, not arity sniffing)."""
    from spacy_llm_ray.tasks.sharding import make_shard_mapper
    from spacy_llm_ray.tokenizer import tokenize

    calls = []

    def render(st, i, n, sep="\n"):
        calls.append(sep)
        return st

    text = "one two three four five six seven eight nine ten " * 4
    mapper = make_shard_mapper()
    shards = mapper(text, tokenize(text), 12, render)
    assert len(shards) > 1
    assert all(s == "\n" for s in calls)  # offset never leaked into sep
