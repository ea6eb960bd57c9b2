"""Readers (format fallback), example types, scoring, multimodal stubs."""

import json

import numpy as np

import pytest

from spacy_llm_ray.readers import ent_desc_reader_csv, fewshot_reader, file_reader
from spacy_llm_ray.scoring import link_accuracy, span_prf, triple_prf
from spacy_llm_ray.tasks.examples import (
    ELExample,
    RELExample,
    SpanCoTExample,
    SpanExample,
)
from spacy_llm_ray.tokenizer import Span


def test_fewshot_reader_formats(tmp_path):
    data = [{"text": "Jack and Jill went up the hill.",
             "entities": {"PERSON": ["Jack", "Jill"], "LOCATION": ["hill"]}}]
    pj = tmp_path / "ex.json"
    pj.write_text(json.dumps(data))
    pl = tmp_path / "ex.jsonl"
    pl.write_text("\n".join(json.dumps(d) for d in data))
    py = tmp_path / "ex.yml"
    py.write_text(
        "- text: Jack and Jill went up the hill.\n"
        "  entities:\n    PERSON: [Jack, Jill]\n    LOCATION: [hill]\n"
    )
    for p in (pj, pl, py):
        exs = [SpanExample.from_dict(d) for d in fewshot_reader(p)]
        assert exs[0].entities["PERSON"] == ["Jack", "Jill"]


def test_fewshot_reader_wrong_suffix_fallback(tmp_path):
    # JSON content under .yml suffix still parses (format fallback,
    # reader.py:40-70 — YAML is a JSON superset, any format order works).
    p = tmp_path / "ex.yml"
    p.write_text(json.dumps([{"text": "t", "entities": {}}]))
    assert fewshot_reader(p)[0]["text"] == "t"


def test_fewshot_reader_garbage_raises(tmp_path):
    p = tmp_path / "ex.json"
    p.write_text(": not valid : anything [")
    with pytest.raises(ValueError):
        fewshot_reader(p)


def test_file_reader(tmp_path):
    p = tmp_path / "template.txt"
    p.write_text("  You are an expert.  \n")
    assert file_reader(p) == "You are an expert."


def test_ent_desc_reader(tmp_path):
    p = tmp_path / "desc.csv"
    p.write_text('Q1;"first thing"\nbadline\nQ2;second\n')
    descs = ent_desc_reader_csv(p)
    assert descs == {"Q1": "first thing", "Q2": "second"}
    empty = tmp_path / "empty.csv"
    empty.write_text("only-one-column\n")
    with pytest.raises(ValueError):
        ent_desc_reader_csv(empty)


def test_cot_example_roundtrip():
    d = {
        "text": "Jack and Jill went up the hill.",
        "spans": [
            {"text": "Jack", "is_entity": True, "label": "PERSON", "reason": "name"},
            {"text": "went up", "is_entity": False, "label": "==NONE==", "reason": "verb"},
        ],
    }
    ex = SpanCoTExample.from_dict(d)
    assert ex.spans[0].label == "PERSON" and ex.spans[1].is_entity is False


def test_rel_el_examples():
    rel = RELExample.from_dict(
        {"text": "Laura lives in Boston",
         "ents": [{"start_char": 0, "end_char": 5, "label": "PERSON"}],
         "relations": [{"dep": 0, "dest": 0, "relation": "LivesIn"}]}
    )
    assert rel.ents[0].label == "PERSON"
    el = ELExample.from_dict(
        {"text": "*Boston* is nice", "mentions": ["Boston"],
         "entity_descriptions": [["city"]], "entity_ids": [["Q100"]],
         "solutions": ["Q100"]}
    )
    assert el.mentions_str == "*Boston*"


def test_scoring():
    gold = [Span(0, 1, "A", "Q1", 0, 4, "x"), Span(2, 3, "B", "Q2", 10, 14, "y")]
    pred = [Span(0, 1, "A", "Q1", 0, 4, "x"), Span(4, 5, "B", "NIL", 20, 24, "z")]
    prf = span_prf(pred, gold)
    assert prf["ents_p"] == 0.5 and prf["ents_r"] == 0.5
    acc = link_accuracy(pred, gold)
    assert acc["link_accuracy"] == 0.5 and acc["n_links"] == 2
    t = triple_prf({("c", "a", "R", "b")}, {("c", "a", "R", "b"), ("c", "x", "R", "y")})
    assert t["p"] == 1.0 and t["r"] == 0.5


def test_multimodal_real_codecs(ray_session):
    import ray.data

    from spacy_llm_ray.stages.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        ImageFeatureStage,
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        frame_sample_indices,
        make_fake_media_table,
        resize_nearest,
    )

    # PPM round-trip is exact.
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # PPM with comments in the header.
    payload = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    assert decode_ppm(payload).shape == (2, 2, 3)

    # Minimal 24-bit BMP (2x2, bottom-up, stride-padded).
    import struct as _s

    w = h = 2
    stride = (w * 3 + 3) & ~3
    pix = bytes([255, 0, 0, 0, 255, 0]) + b"\x00" * (stride - 6)  # row 0 (bottom)
    pix += bytes([0, 0, 255, 255, 255, 255]) + b"\x00" * (stride - 6)
    header = b"BM" + _s.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    header += _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    bmp = decode_bmp(header + pix)
    assert bmp.shape == (2, 2, 3)
    assert list(bmp[1][0]) == [0, 0, 255]  # bottom row BGR 255,0,0 -> RGB blue? no: stored BGR -> RGB red
    assert list(bmp[1][0]) == [0, 0, 255]

    # WAV round-trip preserves rate and approximate samples.
    tone = (0.25 * np.sin(np.arange(800) / 10.0)).astype(np.float32)
    x, rate = decode_wav(encode_wav(tone, rate=8000))
    assert rate == 8000 and len(x) == 800
    assert np.abs(x - tone).max() < 1e-3

    assert resize_nearest(img, (8, 8)).shape == (8, 8, 3)

    # End-to-end over Ray: real PPM decode -> resize -> features; WAV feats.
    tbl = make_fake_media_table(n=8)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=4, concurrency=1
    ).map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=4, concurrency=1
    )
    rows = out.take_all()
    assert len(rows) == 8
    assert len(rows[0]["pixels"]) == 16 * 16 * 3
    assert len(rows[0]["features"]) == 6
    assert rows[0]["meta"]["mime"] == "image/x-portable-pixmap"
    assert rows[0]["meta"]["width"] == 8 and rows[0]["meta"]["height"] == 8
    # Deterministic decode
    r2 = ds.map_batches(ImageDecodeStage, batch_format="pyarrow", concurrency=1).take(1)[0]
    assert list(r2["pixels"]) == list(rows[0]["pixels"])

    audio = ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=dict(data_col="audio"),
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).take_all()
    assert audio[0]["meta"]["sample_rate"] == 16000
    assert 0.2 < audio[0]["rms"] < 0.5  # 0.5-amplitude sine -> rms ~0.35
    assert audio[0]["duration_s"] == 0.1

    # Unknown format: deterministic fake unless strict.
    import pytest as _pytest

    stage = ImageDecodeStage()
    fake = stage(make_unknown := __import__("pyarrow").table(
        {"data": __import__("pyarrow").array([b"\xff\xd8unknown"], type=__import__("pyarrow").binary())}
    ))
    assert fake["meta"].to_pylist()[0]["mime"] == "image/fake"
    with _pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(make_unknown)
    assert frame_sample_indices(10, 3) == [0, 3, 6, 9]


def test_task_scorers():
    from spacy_llm_ray.scoring import (
        lemma_accuracy,
        sentiment_accuracy,
        textcat_score,
    )

    acc = lemma_accuracy(
        [[("ran", "run"), ("dogs", "dog")]],
        [[("ran", "run"), ("dogs", "dogs")]],
    )
    assert acc["lemma_acc"] == 0.5

    s = sentiment_accuracy([0.9, 0.5], [1.0, 0.5])
    assert abs(s["acc_sentiment"] - 0.95) < 1e-9

    out = textcat_score(
        [{"A": 1.0, "B": 0.0}, {"A": 0.0, "B": 1.0}, {"A": 1.0, "B": 0.0}],
        [{"A": 1.0, "B": 0.0}, {"A": 0.0, "B": 1.0}, {"A": 0.0, "B": 1.0}],
        labels=["A", "B"],
    )
    assert out["cats_accuracy"] == 2 / 3
    assert 0 < out["cats_macro_f"] < 1
    multi = textcat_score(
        [{"A": 0.9, "B": 0.9}], [{"A": 1.0, "B": 0.0}],
        labels=["A", "B"], multi_label=True,
    )
    assert multi["cats_micro_p"] == 0.5 and multi["cats_micro_r"] == 1.0


def test_avi_roundtrip_and_frame_sampling():
    """Pure-numpy uncompressed-AVI codec: encode/decode round-trip (incl.
    odd widths needing DIB row padding), deterministic frame sampling, and
    the strict gate for non-AVI payloads."""
    import numpy as np
    import pytest

    from spacy_llm_ray.stages.multimodal import (
        VideoFrameSampleStage,
        decode_avi_rgb,
        encode_avi_rgb,
        frame_sample_indices,
        make_fake_media_table,
    )

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(5, 6, 7, 3), dtype=np.uint8)
    out, fps = decode_avi_rgb(encode_avi_rgb(frames, fps=12))
    assert fps == 12 and (out == frames).all()

    assert frame_sample_indices(5, 2) == [0, 2, 4]
    assert frame_sample_indices(0, 2) == []

    tbl = make_fake_media_table(6)
    res = VideoFrameSampleStage(every=2)(tbl)
    assert res["n_frames"].to_pylist() == [3, 4, 5, 6, 3, 4]
    assert res["n_sampled"].to_pylist() == [2, 2, 3, 3, 2, 2]
    # means are over real decoded pixels, bounded
    for m in res["video_mean_rgb"].to_pylist():
        assert len(m) == 3 and all(0 <= v <= 255 for v in m)

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        VideoFrameSampleStage(strict=True)._default_decode(b"mp4 payload")
    # non-strict falls back to the deterministic fake (same policy as images)
    fake_frames, fake_fps = VideoFrameSampleStage()._default_decode(b"mp4 payload")
    assert fake_frames.shape == (4, 8, 8, 3) and fake_fps == 10


def test_avi_decoder_robustness():
    """Top-down DIBs (negative biHeight), audio-stream-first files, and
    truncated payloads all decode or gate correctly."""
    import struct

    import numpy as np
    import pytest

    from spacy_llm_ray.stages.multimodal import (
        VideoFrameSampleStage,
        decode_avi_rgb,
        encode_avi_rgb,
    )

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(2, 4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_avi_rgb(frames, fps=10))

    # Flip biHeight negative in the strf chunk -> top-down layout: decoder
    # must skip the row flip (our encoder writes bottom-up rows, so the
    # decoded frames come back vertically mirrored versus the originals).
    off = bytes(payload).find(b"strf") + 8
    w0, h0 = struct.unpack("<ii", bytes(payload[off + 4:off + 12]))
    payload[off + 4:off + 12] = struct.pack("<ii", w0, -h0)
    flipped, _ = decode_avi_rgb(bytes(payload))
    assert (flipped == np.stack([f[::-1] for f in frames])).all()

    # Audio strl listed before the video strl: the audio strf (16 bytes,
    # WAVEFORMATEX-ish) must not be parsed as a BITMAPINFOHEADER.
    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    good = encode_avi_rgb(frames, fps=10)
    auds_strl = b"strl" + chunk(
        b"strh", struct.pack("<4s4s", b"auds", b"\x00" * 4) + b"\x00" * 48
    ) + chunk(b"strf", b"\x01\x00\x01\x00" + b"\x00" * 12)
    # Rebuild a well-formed file with the audio strl LIST FIRST in hdrl
    # (sizes recomputed, unlike a raw byte splice).
    pos, lists = 12, []
    while pos + 8 <= len(good):
        tag = good[pos:pos + 4]
        size = struct.unpack("<I", good[pos + 4:pos + 8])[0]
        lists.append(good[pos + 8:pos + 8 + size])
        pos += 8 + size + (size % 2)
    hdrl_inner = lists[0][4:]  # drop b"hdrl"
    avih_size = struct.unpack("<I", hdrl_inner[4:8])[0]
    cut = 8 + avih_size + (avih_size % 2)
    new_hdrl = (
        b"hdrl" + hdrl_inner[:cut] + chunk(b"LIST", auds_strl) + hdrl_inner[cut:]
    )
    body = b"AVI " + chunk(b"LIST", new_hdrl) + chunk(b"LIST", lists[1])
    audio_first = b"RIFF" + struct.pack("<I", len(body)) + body
    out, fps = decode_avi_rgb(audio_first)
    assert fps == 10 and (out == frames).all()

    # Truncated payload: ValueError (not struct.error), so the non-strict
    # stage falls back to the deterministic fake instead of crashing.
    trunc = bytes(encode_avi_rgb(frames, fps=10))[:40]
    with pytest.raises(ValueError):
        decode_avi_rgb(trunc)
    fake_frames, _ = VideoFrameSampleStage()._default_decode(trunc)
    assert fake_frames.shape == (4, 8, 8, 3)
