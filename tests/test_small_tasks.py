"""TextCat / Lemma / Sentiment / Summarization / Translation / Raw parsers
(reference semantics: tasks/{textcat,lemma,sentiment,summarization}/parser.py)."""

import pytest

from spacy_llm_ray.tasks.lemma import apply_lemmas, parse_lemma_response
from spacy_llm_ray.tasks.sentiment import parse_sentiment_response
from spacy_llm_ray.tasks.summarization import parse_summarization_response
from spacy_llm_ray.tasks.textcat import TextCatConfig, parse_textcat_response
from spacy_llm_ray.tasks.translation import parse_translation_response
from spacy_llm_ray.tasks.raw import parse_raw_response


def test_textcat_binary():
    cfg = TextCatConfig(labels=["Recipe"])
    assert parse_textcat_response(cfg, "POS") == {"Recipe": 1.0}
    assert parse_textcat_response(cfg, "pos") == {"Recipe": 1.0}  # .upper() == POS
    assert parse_textcat_response(cfg, "NEG") == {"Recipe": 0.0}
    assert parse_textcat_response(cfg, "garbage") == {"Recipe": 0.0}


def test_textcat_multilabel():
    cfg = TextCatConfig(labels=["A", "B", "C"], exclusive_classes=False)
    assert parse_textcat_response(cfg, "a, C") == {"A": 1.0, "B": 0.0, "C": 1.0}
    assert parse_textcat_response(cfg, "unknown") == {"A": 0.0, "B": 0.0, "C": 0.0}


def test_textcat_exclusive_multiple_answers_empty():
    cfg = TextCatConfig(labels=["A", "B"], exclusive_classes=True)
    # Exclusive + multiple predictions -> store empty (parser.py:36-44).
    assert parse_textcat_response(cfg, "A, B") == {"A": 0.0, "B": 0.0}
    assert parse_textcat_response(cfg, "B") == {"A": 0.0, "B": 1.0}


def test_lemma_parse_and_guard():
    response = "Lemmatized text:\n'''\nI: I\nsaw: see\nfoxes: fox\nbroken line\n'''"
    parsed = parse_lemma_response(response)
    assert parsed == [["I", "I"], ["saw", "see"], ["foxes", "fox"]]
    # Guard: token count mismatch -> whole shard skipped (lemma/task.py:56-61).
    assert apply_lemmas(4, parsed) is None
    assert apply_lemmas(3, parsed) == ["I", "see", "fox"]


@pytest.mark.parametrize(
    "response,expected",
    [
        ("Answer: 0.75", 0.75),
        ("0.5", 0.5),
        ("Answer:\n1.0", 1.0),
        ("garbage", None),
        ("", None),
    ],
)
def test_sentiment(response, expected):
    assert parse_sentiment_response(response) == expected


def test_summarization_strips_quotes():
    assert parse_summarization_response("'''A short summary.'''") == "A short summary."


def test_translation_raw_identity():
    assert parse_translation_response("  bonjour  ") == "bonjour"
    assert parse_raw_response("  reply  ") == "reply"


def test_lemma_guard_is_per_shard():
    """Reference parity under sharding (r4 ADVICE): the count guard skips
    only the mismatched SHARD (lemma/task.py:56-61) — one bad shard must
    not null the whole doc's lemmas (the old post-reduce per-doc guard
    did exactly that)."""
    import pyarrow as pa

    from spacy_llm_ray.pipelines.queries import _lemma_join, _lemma_shard_guard
    from spacy_llm_ray.stages.llm_stage import LLMTaskStage
    from spacy_llm_ray.templates import extract_fenced_text, lemma_prompt
    from spacy_llm_ray.tokenizer import tokenize

    class _BadSecondShardLemma:
        """MockLemmaModel that drops one line from the SECOND shard's
        response — a count mismatch on that shard only."""

        context_length = 48  # force >= 2 shards for the text below

        def __init__(self):
            self.prompts_seen = 0

        def __call__(self, prompts):
            out = []
            for p in prompts:
                toks = tokenize(extract_fenced_text(p))
                lines = [f"{t.text}: {t.text.lower()}" for t in toks]
                if self.prompts_seen == 1:
                    lines = lines[:-1]
                out.append("\n".join(lines))
                self.prompts_seen += 1
            return out

    from spacy_llm_ray.tasks.lemma import parse_lemma_response

    text = " ".join(f"Word{i}" for i in range(60))
    model = _BadSecondShardLemma()
    stage = LLMTaskStage(
        model=model,
        prompt_fn=lemma_prompt,
        parse_fn=parse_lemma_response,
        out_col="lemmas",
        out_type=pa.string(),
        reduce="concat_list",
        post_fn=_lemma_join,
        shard_post_fn=_lemma_shard_guard,
    )
    out = stage(pa.table({"text": [text]}))
    lemmas = out["lemmas"][0].as_py()
    assert model.prompts_seen >= 2, "text did not shard; raise its length"
    all_lower = " ".join(t.text.lower() for t in tokenize(text))
    # Per-shard guard: the good shards' lemmas survive...
    assert lemmas != ""
    assert lemmas.startswith("word0")
    # ...and only the corrupted shard's are dropped.
    assert lemmas != all_lower
    assert len(lemmas.split()) < len(all_lower.split())
