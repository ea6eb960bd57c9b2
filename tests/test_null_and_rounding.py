"""Null-text hardening + oracle round-mode parity for the batch kernels.

The driver's testdata has no null text, so these paths only fire on real
corpora (r5 review findings 1/7): every text kernel must either
null-propagate (fingerprints, BPE counts — matching md5(NULL)=NULL SQL
semantics) or score the doc as empty (langid, flat word hashes), and the
cosine emitters must round ties half-away-from-zero exactly like the
DuckDB oracles' round().
"""

import numpy as np
import pyarrow as pa

from spacy_llm_ray.stages.dedup import _flat_word_hashes, _round6_half_away
from spacy_llm_ray.stages.textstats import (
    LangIdStage,
    md5_fingerprint_batch,
    rolling_hash_fingerprint_batch,
    token_count_batch,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_md5_fingerprint_null_propagates():
    out = md5_fingerprint_batch(_tbl(["abc", None, ""]))
    fps = out["fingerprint"].to_pylist()
    assert fps[1] is None
    import hashlib

    assert fps[0] == hashlib.md5(b"abc").hexdigest()
    assert fps[2] == hashlib.md5(b"").hexdigest()


def test_rolling_fingerprint_null_propagates():
    out = rolling_hash_fingerprint_batch(_tbl(["a b c d e f", None]))
    vals = out["rolling_fp"].to_pylist()
    assert vals[1] is None and vals[0] is not None


def test_bpe_count_null_propagates():
    try:
        from spacy_llm_ray.stages.textstats import bpe_token_count_batch

        out = bpe_token_count_batch(_tbl(["hello world", None]))
    except RuntimeError:  # regex package absent
        return
    counts = out["n_bpe_tokens"].to_pylist()
    assert counts[0] == 2 and counts[1] is None


def test_langid_null_text_scores_und():
    stage = LangIdStage()
    out = stage(_tbl(["the of and to in it is that", None, ""]))
    langs = out["lang_pred"].to_pylist()
    assert langs[0] == "en"
    # Null and empty behave identically: no evidence -> "und".
    assert langs[1] == langs[2] == "und"


def test_token_count_null_text():
    out = token_count_batch(_tbl(["one two", None]))
    counts = out["n_tokens"].to_pylist()
    assert counts[0] == 2
    # Arrow count_substring_regex null-propagates; either null or 0 is a
    # defensible convention — what it must NOT do is crash or mislabel a
    # real doc.
    assert counts[1] in (None, 0)


def test_flat_word_hashes_null_and_chunked():
    from spacy_llm_ray.stages.dedup import _WordHasher

    texts = pa.chunked_array([["a b", None], ["c d e"]])
    wh, counts, starts = _flat_word_hashes(texts, _WordHasher())
    assert list(counts) == [2, 0, 3]
    assert list(starts) == [0, 2, 2]
    assert len(wh) == 5


def test_round6_half_away_matches_duckdb():
    x = np.array([0.1234565, -0.1234565, 0.5e-6, -0.5e-6, 0.99999999, 0.0])
    got = _round6_half_away(x)
    import duckdb

    want = [
        duckdb.sql(f"select round({v!r}::DOUBLE, 6)").fetchone()[0] for v in x
    ]
    assert got.tolist() == want
