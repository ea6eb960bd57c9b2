"""Deterministic, answer-bearing mock models.

The reference tests wire pipelines with a NoOp model (returns "") plus
hand-written gold response strings fed straight into the parsers. For
end-to-end Ray runs we need a model that *derives* correct responses from the
prompt alone — a stand-in for a perfect LLM. These mocks:

- see only the prompt (they recover the fenced document text),
- hold small broadcastable state (gazetteer / nothing / nothing),
- are strictly deterministic, so pipeline output is oracle-checkable in SQL.

They produce responses in exactly the formats the reference parsers consume
(CoT lines / JSON-per-line / ``*mention* ::: <qid>``), so the *real* parsing
machinery is exercised end to end.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from ..templates import extract_fenced_text

GAZETTEER_MODEL_KIND = "gazetteer"


class MockNERModel:
    """Emits one CoT line per gazetteer hit, in text order (leftmost-longest,
    non-overlapping) — the response format of spacy.NER.v3. With
    ``fmt="v1"`` it instead answers in the v1/v2 line format
    ``"<LABEL>: phrase1, phrase2"`` (one line per label, unique phrases).
    With ``fmt="overlap"`` (the SpanCat stand-in) every surface is scanned
    INDEPENDENTLY, so nested aliases ("New York" inside "New York City") are
    all reported, ordered (start, longest-first) — the order the v3 CoT
    parser's forward cursor requires to ground overlapping spans."""

    def __init__(self, gazetteer: Dict[str, str], context_length: Optional[int] = None,
                 fmt: str = "cot"):
        # Sort alternatives longest-first so the regex prefers the longest match.
        surfaces = sorted(gazetteer.keys(), key=len, reverse=True)
        self._pattern = re.compile(
            r"\b(" + "|".join(re.escape(s) for s in surfaces) + r")\b"
        ) if surfaces else None
        self._surface_patterns = [
            (s, re.compile(r"\b" + re.escape(s) + r"\b")) for s in surfaces
        ]
        self._gazetteer = dict(gazetteer)
        self._fmt = fmt
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            text = extract_fenced_text(prompt)
            lines: List[str] = []
            if self._pattern is not None and self._fmt == "cot":
                for i, m in enumerate(self._pattern.finditer(text)):
                    label = self._gazetteer[m.group(1)]
                    lines.append(f"{i + 1}. {m.group(1)} | True | {label} | is a {label}")
            elif self._pattern is not None and self._fmt == "overlap":
                hits = []
                for s, pat in self._surface_patterns:
                    for m in pat.finditer(text):
                        hits.append((m.start(), -len(s), s))
                for i, (_, _, s) in enumerate(sorted(hits)):
                    label = self._gazetteer[s]
                    lines.append(f"{i + 1}. {s} | True | {label} | is a {label}")
            elif self._pattern is not None:
                by_label: Dict[str, List[str]] = {}
                for m in self._pattern.finditer(text):
                    label = self._gazetteer[m.group(1)]
                    phrases = by_label.setdefault(label, [])
                    if m.group(1) not in phrases:
                        phrases.append(m.group(1))
                lines = [f"{label}: {', '.join(ps)}" for label, ps in by_label.items()]
            out.append("\n".join(lines))
        return out


class MockRELModel:
    """Scans the preannotated ([ENTi:LABEL]-marked) text for
    ``<subj marker> <pred phrase> <obj>...<obj marker>`` patterns and emits one
    JSON line per relation — the response format of spacy.REL.v1."""

    def __init__(
        self,
        predicates: Dict[str, str],  # surface phrase -> relation label
        context_length: Optional[int] = None,
    ):
        self._predicates = dict(predicates)
        alt = "|".join(re.escape(p) for p in sorted(predicates, key=len, reverse=True))
        self._pattern = re.compile(
            r"\[ENT(\d+):\w+\] (" + alt + r") [^.\[\]]*?\[ENT(\d+):\w+\]"
        )
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            text = extract_fenced_text(prompt)
            lines = []
            for m in self._pattern.finditer(text):
                rel = self._predicates[m.group(2)]
                lines.append(
                    '{"dep": %s, "dest": %s, "relation": "%s"}'
                    % (m.group(1), m.group(3), rel)
                )
            out.append("\n".join(lines))
        return out


_EL_CAND_RE = re.compile(r"^- \*(?P<mention>.+?)\*: candidates: (?P<first>[^\s(;]+)", re.M)


class MockELModel:
    """Answers each mention block with its first-listed candidate — i.e. the
    top-prior candidate, since the EL stage lists candidates sorted by prior
    (cf. candidate_selector.py:44-55). Response format of
    spacy.EntityLinker.v1: ``*<mention>* ::: <<qid>>``."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            lines = []
            for m in _EL_CAND_RE.finditer(prompt):
                lines.append(f"*{m.group('mention')}* ::: <{m.group('first')}>")
            out.append("\n".join(lines))
        return out


class EchoModel:
    """Returns the fenced document text itself (useful for Raw/Translation
    smoke paths)."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        return [extract_fenced_text(p) for p in prompts]


class MockUpperModel:
    """'Translation' mock: uppercases the fenced text (SQL-replicable)."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        return [extract_fenced_text(p).upper() for p in prompts]


class MockLemmaModel:
    """Lemma mock: one ``token: lowercase`` line per engine token of the
    fenced text — exercises the lemma parser + count guard exactly."""

    def __init__(self, context_length: Optional[int] = None):
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        from ..tokenizer import tokenize

        out = []
        for p in prompts:
            toks = tokenize(extract_fenced_text(p))
            out.append("\n".join(f"{t.text}: {t.text.lower()}" for t in toks))
        return out


class MockTextCatModel:
    """Binary textcat mock: POS iff ``keyword`` occurs in the lowercased
    fenced text (substring semantics, SQL LIKE-replicable)."""

    def __init__(self, keyword: str, context_length: Optional[int] = None):
        self._keyword = keyword.lower()
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        return [
            "POS" if self._keyword in extract_fenced_text(p).lower() else "NEG"
            for p in prompts
        ]


class MockSentimentModel:
    """Sentiment mock: integer-valued score = count(pos_word) -
    count(neg_word) over word tokens (exact in float, SQL-replicable)."""

    def __init__(self, pos_word: str = "fast", neg_word: str = "slow",
                 context_length: Optional[int] = None):
        self._pos = pos_word
        self._neg = neg_word
        self._word_re = re.compile(r"\w+", re.UNICODE)
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for p in prompts:
            words = self._word_re.findall(extract_fenced_text(p).lower())
            score = sum(w == self._pos for w in words) - sum(w == self._neg for w in words)
            out.append(f"Answer: {score}")
        return out


class MockSummaryModel:
    """Summarization mock: first ``n_words`` whitespace tokens, '''-fenced
    like a real reply (SQL array_slice-replicable)."""

    def __init__(self, n_words: int = 10, context_length: Optional[int] = None):
        self._n = n_words
        self.context_length = context_length

    def __call__(self, prompts: List[str]) -> List[str]:
        out = []
        for p in prompts:
            words = extract_fenced_text(p).split()
            out.append("'''" + " ".join(words[: self._n]) + "'''")
        return out


class EchoChatTransport:
    """Offline HTTP transport replaying the OpenAI chat-completions schema.

    Stands in for the network in tests/correctness runs: decodes the request
    body the codec built, echoes the prompt's fenced document text back as
    ``choices[0].message.content`` — so the full request-build/response-parse
    path of ``OpenAIProvider`` runs without a network. Deterministic and
    picklable (safe to ship into map_batches actors).
    """

    def __call__(self, method, url, headers, json_body, params, timeout):
        import json as _json

        content = json_body["messages"][0]["content"]
        reply = extract_fenced_text(content)
        body = {"choices": [{"message": {"role": "assistant", "content": reply}}]}
        return 200, _json.dumps(body).encode()
