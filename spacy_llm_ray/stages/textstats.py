"""Text-analysis stages for large-scale training-data pipelines.

All are stateless-or-cheap ``map_batches`` transforms over Arrow/pandas
batches: token counting, quality counters, document fingerprinting, and a
stopword-profile language-ID heuristic (stateful: profiles compiled once per
actor)."""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

# ASCII class: Python's re.UNICODE \w matches accented/CJK letters that
# RE2 engines (Arrow's count_substring_regex, DuckDB's regexp_*) do not,
# so the scalar reference paths must use the same ASCII [0-9A-Za-z_]
# class as the vectorized kernels and the SQL oracles — otherwise keep
# flags / counts silently diverge on non-ASCII corpora.
_WORD_RE = re.compile(r"\w+", re.ASCII)
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count (spacy.NTokenEstimator.v1 semantics,
    /root/reference/spacy_llm/tasks/util/sharding.py:16-17): the number of
    ``\\S+`` runs, one Arrow regex-count kernel over the batch (== strip +
    split-on-whitespace length, 0 for empty/whitespace-only)."""
    n = pc.cast(
        pc.count_substring_regex(batch[text_col], pattern=r"\S+"), pa.int64()
    )
    return batch.append_column("n_tokens", n)


def quality_counters_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality counters: n_chars, n_words, n_punct (ratios derive
    downstream; integers keep oracle comparison exact). Three Arrow kernels
    over the whole batch — ``utf8_length`` == Python ``len`` on str, and
    ``count_substring_regex`` counts non-overlapping matches == Python
    ``len(re.findall(...))`` (RE2 ``\\w``/``\\s`` match the DuckDB oracle's
    regexp engine class)."""
    texts = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    n_words = pc.cast(
        pc.count_substring_regex(texts, pattern=r"\w+"), pa.int64()
    )
    n_punct = pc.cast(
        pc.count_substring_regex(texts, pattern=r"[^\w\s]"), pa.int64()
    )
    return (
        batch.append_column("n_chars_calc", n_chars)
        .append_column("n_words", n_words)
        .append_column("n_punct", n_punct)
    )


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    # None -> None: null-propagating like the Arrow kernels (and DuckDB's
    # md5(NULL) = NULL), instead of crashing on .encode().
    fps = [
        hashlib.md5(t.encode()).hexdigest() if t is not None else None
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


def rolling_hash_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Rabin-Karp-style rolling-hash document fingerprint: min rolling hash
    over word ``window``-grams (a cheap content-defined fingerprint; stable
    under whitespace-preserving edits outside the minimal window)."""
    out = []
    for t in batch[text_col].to_pylist():
        if t is None:  # null-propagate like the other kernels
            out.append(None)
            continue
        words = t.split()
        if len(words) < window:
            h = hash_words(words)
        else:
            h = min(hash_words(words[i : i + window]) for i in range(len(words) - window + 1))
        out.append(h)
    return batch.append_column("rolling_fp", pa.array(out, type=pa.int64()))


def hash_words(words: List[str], mod: int = (1 << 61) - 1, base: int = 1_000_003) -> int:
    h = 0
    for w in words:
        wh = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        h = (h * base + wh) % mod
    return h


# Stopword profiles for a trigram/stopword language-ID heuristic. Tiny,
# deterministic; real deployments would broadcast trained profiles.
_LANG_STOPWORDS: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for",
           "table", "row", "value", "scan", "fast", "slow", "key", "hash", "part",
           "merge", "batch", "agg"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zeile", "wert", "tabelle", "schnell", "langsam", "schluessel"},
    "fr": {"le", "la", "les", "et", "est", "pas", "avec", "un", "une", "des",
           "ligne", "valeur", "table", "rapide", "lent", "cle"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "con", "un", "una",
           "fila", "valor", "tabla", "rapido", "lento", "clave"},
}


class LangIdStage:
    """Stopword-overlap language ID (n-gram heuristic; stateful — profiles
    compiled once per actor). CJK short-circuit by Unicode block ratio."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self._text_col = text_col
        self._out_col = out_col
        self._profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}
        self._word_re = _WORD_RE

    def _predict(self, text: str) -> str:
        """Scalar reference path (parity-tested against the batch kernel)."""
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
        if cjk > len(text[:200]) * 0.2:
            return "zh"
        words = self._word_re.findall(text.lower())
        if not words:
            return "und"
        best_lang, best_score = "und", 0.0
        for lang, stops in self._profiles.items():
            score = sum(1 for w in words if w in stops) / len(words)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang if best_score > 0.05 else "und"

    def _predict_batch(self, texts) -> pa.Array:
        """Whole-batch kernel: Arrow slice/regex-count for the CJK
        short-circuit, Arrow tokenize (``utf8_lower`` + ``\\W+`` split ==
        the scalar ASCII ``\\w+`` findall — same RE2 word class), then one
        ``pc.is_in`` + bincount per language profile. Scores divide as float64 exactly like the scalar path, so
        tie/threshold behavior is bit-identical."""
        import numpy as np

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        if n_docs == 0:
            return pa.array([], type=pa.string())
        # Null texts -> "" so the vectorized pipeline scores them "und"
        # like the scalar path did (a null otherwise propagates NaN into
        # the repeat-counts and crashes np.repeat).
        texts = pc.fill_null(texts, "")
        head = pc.utf8_slice_codeunits(texts, 0, 200)
        head_len = pc.utf8_length(head).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cjk = pc.count_substring_regex(
            head, pattern="[一-鿿]"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        is_zh = cjk > head_len * 0.2
        word_lists = pc.split_pattern_regex(
            pc.utf8_lower(texts), pattern=r"\W+"
        )
        if isinstance(word_lists, pa.ChunkedArray):
            word_lists = word_lists.combine_chunks()
        raw_counts = pc.list_value_length(word_lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = word_lists.flatten()
        keep = pc.greater(pc.binary_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(n_docs, dtype=np.int64), raw_counts
        )[keep_np]
        words = flat.filter(keep)
        counts = np.bincount(doc_idx, minlength=n_docs).astype(np.float64)
        nz = counts > 0
        best_lang = np.full(n_docs, "und", dtype=object)
        best_score = np.zeros(n_docs, dtype=np.float64)
        for lang, value_set in self._profile_arrays.items():
            hit = pc.is_in(words, value_set=value_set).to_numpy(
                zero_copy_only=False
            )
            lang_counts = np.bincount(
                doc_idx[hit], minlength=n_docs
            ).astype(np.float64)
            score = np.divide(
                lang_counts, counts, out=np.zeros(n_docs), where=nz
            )
            better = score > best_score
            best_lang[better] = lang
            best_score[better] = score[better]
        out = np.where(best_score > 0.05, best_lang, "und")
        out = np.where(is_zh, "zh", out)
        return pa.array(out.tolist(), type=pa.string())

    @property
    def _profile_arrays(self):
        arrays = getattr(self, "_profile_arrays_cache", None)
        if arrays is None:
            arrays = {
                lang: pa.array(sorted(stops))
                for lang, stops in self._profiles.items()
            }
            self._profile_arrays_cache = arrays
        return arrays

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self._predict_batch(batch[self._text_col])
        return batch.append_column(self._out_col, preds)


# GPT-2-style pre-tokenizer split pattern, lookahead-free so the identical
# pattern runs in both Python `regex` and DuckDB's RE2 (the original GPT-2
# pattern's `\s+(?!\S)` branch needs lookahead; dropping it merges trailing
# whitespace runs into single tokens — a BPE-ish approximation, stated as
# such). Unicode letter/number classes included.
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

try:
    import regex as _regex

    _BPE_RE = _regex.compile(BPE_SPLIT_PATTERN)
except ImportError:  # pragma: no cover — regex ships with this environment
    _BPE_RE = None


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count: GPT-2-style pre-tokenizer splits (contractions,
    letter runs, number runs, punctuation runs, whitespace runs) — the
    standard cheap LLM-token estimator when no tokenizer model is loaded."""
    if _BPE_RE is None:
        raise RuntimeError("the `regex` package is required for BPE counting")
    counts = [
        len(_BPE_RE.findall(t)) if t is not None else None
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(
        "n_bpe_tokens", pa.array(counts, type=pa.int64())
    )
