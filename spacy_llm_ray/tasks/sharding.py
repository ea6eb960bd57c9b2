"""Context-window sharding.

Mirrors the reference's greedy binary-search shard mapper
(/root/reference/spacy_llm/tasks/util/sharding.py:22-103) and whitespace
token estimator (:9-19), operating on our (text, tokens) representation.
Shard text is recovered by char slicing (token-start to next-token-start), so
inter-token whitespace is preserved exactly as in the reference's
``doc[a:b].as_doc().text``.

In the engine, sharding runs *inside* the LLM actor stage: a document row is
expanded to shard prompts, the model is called per shard, responses are parsed
per shard, and shard results are reduced back to one document row within the
same ``map_batches`` invocation — no extra shuffle
(cf. SURVEY.md §2.6's fuse-in-stage design).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List

from ..tokenizer import Token


class LazyTokenList:
    """List-like token sequence that defers Token construction.

    The shard mapper needs only ``len(tokens)`` when a document fits one
    shard (the overwhelmingly common case), so ``__len__`` counts regex
    matches without building Token objects; any indexing/iteration
    materializes the full list once. Use where the token list is consumed
    ONLY by the shard mapper (e.g. REL's marker-aware tokenization) — not
    where parsers later align spans against it.
    """

    __slots__ = ("_text", "_build", "_count_re", "_toks", "_n")

    def __init__(self, text: str, build: Callable, count_re):
        self._text = text
        self._build = build
        self._count_re = count_re
        self._toks = None
        self._n = None

    def _materialize(self):
        if self._toks is None:
            self._toks = self._build(self._text)
        return self._toks

    def __len__(self) -> int:
        if self._toks is not None:
            return len(self._toks)
        if self._n is None:
            n = 0
            for n, _ in enumerate(self._count_re.finditer(self._text), 1):
                pass
            self._n = n
        return self._n

    def __getitem__(self, i):
        return self._materialize()[i]

    def __iter__(self):
        return iter(self._materialize())


def count_tokens_by_spaces(value: str) -> int:
    """spacy.NTokenEstimator.v1 (sharding.py:16-17)."""
    return len(value.split())


@dataclass(frozen=True)
class Shard:
    text: str
    char_offset: int  # char offset of shard start within the document text
    tok_start: int
    tok_end: int      # exclusive
    i_shard: int
    n_shards: int     # filled after mapping completes


def _slice_text(text: str, tokens: List[Token], start: int, end: int) -> str:
    if start >= len(tokens) or end <= start:
        return ""
    lo = tokens[start].start
    hi = tokens[end].start if end < len(tokens) else len(text)
    return text[lo:hi]


def make_shard_mapper(
    n_token_estimator: Callable[[str], int] = count_tokens_by_spaces,
    buffer_frac: float = 1.1,
):
    """Returns ``map_to_shards(text, tokens, context_length, render) -> [Shard]``.

    ``render(shard_text, i_shard, n_shards)`` renders the full prompt for a
    shard; the mapper greedily grows/halves candidate shards until each
    rendered prompt fits ``context_length`` under ``buffer_frac`` slack.
    """

    def map_to_shards(
        text: str,
        tokens: List[Token],
        context_length: int | None,
        render: Callable[..., str],
    ) -> List[Shard]:
        # Offset-aware renderers OPT IN by setting ``accepts_offset = True``
        # on the callable; they then receive the shard's char offset as a
        # 4th argument so the fit check can account for the shard's REAL
        # prompt data (EL injects per-mention candidate blocks after
        # slicing; the reference sizes the fully rendered prompt,
        # sharding.py:42-60). Explicit marker instead of arity sniffing:
        # default parameters / bound methods make argument counting
        # ambiguous for user-supplied renderers (ShardMapper.v1 is public).
        if getattr(render, "accepts_offset", False):
            call_render = render
        else:
            call_render = lambda st, i, n, off: render(st, i, n)  # noqa: E731

        if context_length is None or (
            n_token_estimator(call_render(text, 0, 1, 0)) * buffer_frac
            <= context_length
        ):
            return [Shard(text, 0, 0, len(tokens), 0, 1)]

        n = len(tokens)
        shards: List[tuple] = []  # (tok_start, tok_end)
        fraction = 0.5
        start_idx = 0
        n_shards_est = 1
        while start_idx < n:
            remaining = n - start_idx
            fits = False
            end_idx = start_idx
            while not fits:
                end_idx = start_idx + max(1, int(remaining * fraction))
                shard_text = _slice_text(text, tokens, start_idx, end_idx)
                fits = (
                    n_token_estimator(
                        call_render(
                            shard_text, len(shards), n_shards_est,
                            tokens[start_idx].start,
                        )
                    )
                    * buffer_frac
                    <= context_length
                )
                fraction /= 2
                if end_idx - start_idx == 1 and not fits:
                    raise ValueError(
                        "Prompt size doesn't allow for the inclusion of a shard of "
                        "length 1. Please review your prompt and reduce its size."
                    )
            shards.append((start_idx, end_idx))
            fraction = 1
            n_shards_est = len(shards) + 1
            start_idx = end_idx

        n_shards = len(shards)
        return [
            Shard(
                text=_slice_text(text, tokens, s, e),
                char_offset=tokens[s].start,
                tok_start=s,
                tok_end=e,
                i_shard=i,
                n_shards=n_shards,
            )
            for i, (s, e) in enumerate(shards)
        ]

    return map_to_shards
