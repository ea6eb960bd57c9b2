"""Auto-routing between broadcast and shuffle semi-join in q3 (the
broadcast-join threshold pattern; see also the canonicalization pair-bound
auto-route). Both routes must emit identical rows."""

import pandas as pd

import spacy_llm_ray.pipelines.queries as q

SF_DIR = "/root/testdata/sf0.001"


def _run_q3():
    out = q.q_q3_top_orders(SF_DIR)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    return df.reset_index(drop=True)


def test_q3_broadcast_and_shuffle_routes_identical(ray_session, monkeypatch):
    # Tiny dimension -> broadcast route by default.
    broadcast = _run_q3()
    assert len(broadcast) == 10
    # Force the shuffle semi-join route (what a 100x dimension would take).
    monkeypatch.setattr(q, "BROADCAST_SEMI_MAX_BYTES", 0)
    shuffle = _run_q3()
    pd.testing.assert_frame_equal(broadcast, shuffle)
