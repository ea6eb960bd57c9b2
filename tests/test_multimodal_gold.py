"""Encoder-side media feature gold (the media_features value oracle)."""

import numpy as np
import pyarrow as pa

from spacy_llm_ray.stages import multimodal as mm


def test_gold_matches_decode_side_features():
    """The encoder-side gold (raw arrays, no decoders) must equal the
    decode-side stage pipeline value-for-value — this is what makes the
    media_features oracle a real decode check (r3 VERDICT #5)."""
    n = 12
    table = mm.make_fake_media_table(n=n)
    gold = mm.media_features_gold(n=n)

    # Decode side: run the stages directly (no Ray needed for the check).
    t = mm.ImageDecodeStage()(table)
    t = mm.ImageFeatureStage()(t)
    t = t.drop_columns(["meta"])
    t = mm.AudioFeatureStage(data_col="audio")(t)
    t = mm.VideoFrameSampleStage(data_col="video", every=2)(t)

    feats = np.array(t["features"].to_pylist(), dtype=np.float64).reshape(-1, 6)
    for j, c in enumerate(["mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b"]):
        assert np.array_equal(np.round(feats[:, j], 4), gold[c].to_numpy()), c
    import pyarrow.compute as pc

    for c in ("duration_s", "rms", "zcr"):
        assert pc.round(t[c], ndigits=4).combine_chunks() == gold[c].combine_chunks(), c
    for c in ("n_frames", "fps", "n_sampled"):
        assert t[c].to_pylist() == gold[c].to_pylist(), c
    vm = np.array(t["video_mean_rgb"].to_pylist(), dtype=np.float64).reshape(-1, 3)
    for j, c in enumerate(("vid_mean_r", "vid_mean_g", "vid_mean_b")):
        assert np.array_equal(np.round(vm[:, j], 4), gold[c].to_numpy()), c


def test_image_feature_stage_batch_shape_invariant():
    """Integer-exact float64 accumulation: per-item features must not depend
    on how rows are batched (float32 reductions differed in the 4th decimal
    between batch sizes before)."""
    table = mm.make_fake_media_table(n=20)
    dec = mm.ImageDecodeStage()(table)
    full = mm.ImageFeatureStage()(dec)["features"].to_pylist()
    parts = []
    for lo in range(0, 20, 3):
        parts.extend(mm.ImageFeatureStage()(dec.slice(lo, 3))["features"].to_pylist())
    assert full == parts


def test_raw_items_deterministic_and_payloads_stable():
    a = mm.make_fake_media_table(n=6)
    b = mm.make_fake_media_table(n=6)
    assert a.equals(b)
    g1 = mm.media_features_gold(n=6)
    g2 = mm.media_features_gold(n=6)
    assert g1.equals(g2)
