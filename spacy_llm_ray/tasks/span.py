"""Span-task response parsing (NER v1/v2/v3, SpanCat).

Pure functions over (text, tokens, response) replicating the reference's
semantics exactly:

- v1/v2 line format ``"<LABEL>: ent1, ent2"`` with label normalization,
  unknown-label drop, multi-occurrence substring grounding and char-span
  alignment (/root/reference/spacy_llm/tasks/span/parser.py:10-71),
- v3 chain-of-thought line format ``"N. text | True|False | LABEL | reason"``
  with incremental left-to-right matching, a ``find_after`` cursor, the
  repeated-span retry rule and the overlap rule
  (/root/reference/spacy_llm/tasks/span/parser.py:74-179), SpanReason codec
  (/root/reference/spacy_llm/tasks/span/examples.py:25-70).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Optional, Tuple

from ..normalizers import build_label_dict, lowercase_normalizer
from ..parsing import find_substrings
from ..tokenizer import Span, Token, Tokenization, make_span


@dataclass
class SpanReason:
    text: str
    is_entity: bool
    label: str
    reason: str

    @classmethod
    def from_str(cls, line: str, sep: str = "|") -> "SpanReason":
        """Parse one CoT output line; optional leading ``N.`` list number is
        stripped (anything before the first '.')."""
        clean = line.strip()
        if "." in clean:
            clean = clean.split(".", maxsplit=1)[1]
        parts = [c.strip() for c in clean.split(sep)]
        if len(parts) != 4:
            raise ValueError(f"not a SpanReason line: {line!r}")
        return cls(
            text=parts[0],
            is_entity=parts[1].lower() == "true",
            label=parts[2],
            reason=parts[3],
        )

    def to_str(self, sep: str = "|") -> str:
        return f"{self.text} {sep} {self.is_entity} {sep} {self.label} {sep} {self.reason}"


@dataclass
class SpanTaskConfig:
    """Parsing-relevant slice of a span task's configuration.

    Defaults mirror the reference task factories
    (/root/reference/spacy_llm/tasks/ner/registry.py:29-31).
    """

    labels: List[str]
    normalizer: Callable[[str], str] = lowercase_normalizer
    alignment_mode: str = "contract"
    case_sensitive_matching: bool = False
    single_match: bool = False
    allow_overlap: bool = False
    label_dict: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if not self.label_dict:
            self.label_dict = build_label_dict(self.labels, self.normalizer)


def _format_response(
    response: str,
    normalizer: Callable[[str], str],
    label_dict: Dict[str, str],
) -> Iterable[Tuple[str, List[str]]]:
    """``"<LABEL>: a, b"`` lines -> [(label, [phrases])], unknown labels dropped."""
    out = []
    for line in response.strip().split("\n"):
        if line and ":" in line:
            label, phrases = line.split(":", 1)
            norm = normalizer(label)
            if norm in label_dict and phrases.strip():
                out.append((label_dict[norm], [p.strip() for p in phrases.strip().split(",")]))
    return out


def parse_span_response(
    cfg: SpanTaskConfig, text: str, tokens: List[Token], response: str
) -> List[Span]:
    """NER/SpanCat v1/v2 parser: ground each phrase at every occurrence."""
    tokens = tokens if isinstance(tokens, Tokenization) else Tokenization(list(tokens))
    spans: List[Span] = []
    for label, phrases in _format_response(response, cfg.normalizer, cfg.label_dict):
        offsets = find_substrings(
            text,
            phrases,
            case_sensitive=cfg.case_sensitive_matching,
            single_match=cfg.single_match,
        )
        for start, end in offsets:
            span = make_span(text, tokens, start, end, label, cfg.alignment_mode)
            if span is not None:
                spans.append(span)
    return spans


def _extract_span_reasons(cfg: SpanTaskConfig, response: str) -> List[SpanReason]:
    reasons: List[SpanReason] = []
    for line in response.strip().split("\n"):
        try:
            sr = SpanReason.from_str(line)
        except ValueError:
            continue
        if not sr.is_entity:
            continue
        norm = cfg.normalizer(sr.label)
        if norm not in cfg.label_dict:
            continue
        sr.label = cfg.label_dict[norm]
        reasons.append(sr)
    return reasons


def parse_span_response_cot(
    cfg: SpanTaskConfig, text: str, tokens: List[Token], response: str
) -> List[Span]:
    """v3 CoT parser: incremental left-to-right span grounding.

    Spans are expected in text order; a cursor (``find_after``) moves past each
    grounded span (or stays at its start when overlap is allowed). A span equal
    to the previous one retries the same reason further into the text.
    Result is ``sorted(set(spans))``.
    """
    tokens = tokens if isinstance(tokens, Tokenization) else Tokenization(list(tokens))
    span_reasons = _extract_span_reasons(cfg, response)
    # Case folding is done ONCE per document; per-reason searches then run on
    # the folded text directly. Semantically identical to calling
    # find_substrings(single_match=True) per reason (str.lower() is
    # length-preserving here), but avoids re-folding the whole text for every
    # mention — the dominant allocation cost on mention-dense documents.
    search_text = text if cfg.case_sensitive_matching else text.lower()
    find_after = 0
    spans: List[Span] = []
    prev_span: Optional[Span] = None
    idx = 0
    while idx < len(span_reasons):
        sr = span_reasons[idx]
        sub = sr.text if cfg.case_sensitive_matching else sr.text.lower()
        start = search_text.find(sub, find_after) if sub else -1
        if start == -1:
            idx += 1
            continue
        end = start + len(sub)
        span = make_span(text, tokens, start, end, sr.label, cfg.alignment_mode)
        if span is None:
            idx += 1
            continue
        if span == prev_span:
            find_after = span.end_char
            continue
        spans.append(span)
        find_after = span.start_char if cfg.allow_overlap else span.end_char
        prev_span = span
        idx += 1
    return sorted(set(spans))
