"""Canonicalization unit behaviors: union-find over (surface, qid) pairs,
min-ID merge determinism, NIL isolation, case-folded surface equivalence."""

import pyarrow as pa
import pytest

from spacy_llm_ray.kb import kb_from_dicts
from spacy_llm_ray.stages.canonicalize import (
    _UnionFind,
    build_canonical_mapping,
    canonicalize_triples,
)


@pytest.fixture()
def kb():
    return kb_from_dicts(
        {
            "Q2": {"name": "Acme Corporation", "desc": "manufacturer"},
            "Q60": {"name": "New York City", "desc": "city"},
        },
        [
            {"alias": "Acme Corp", "entities": ["Q2"], "probabilities": [0.7]},
            {"alias": "Acme Corporation", "entities": ["Q2"], "probabilities": [0.9]},
        ],
    )


def _triples_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [r[0] for r in rows],
                "subj": [r[1] for r in rows],
                "subj_label": ["X"] * len(rows),
                "subj_qid": [r[2] for r in rows],
                "pred": ["P"] * len(rows),
                "obj": [r[3] for r in rows],
                "obj_label": ["Y"] * len(rows),
                "obj_qid": [r[4] for r in rows],
            }
        )
    )


def test_union_find_deterministic_roots():
    uf = _UnionFind()
    uf.union("b", "c")
    uf.union("a", "b")
    assert uf.find("c") == uf.find("a") == "a"  # smallest string is the root


def test_mapping_merges_surfaces_sharing_qid(ray_session, kb):
    ds = _triples_ds(
        [
            ("c1", "Acme Corp", "Q2", "New York", "Q60"),
            ("c2", "Acme Corporation", "Q2", "Zorblat", "NIL"),
        ]
    )
    mapping = build_canonical_mapping(ds, kb)
    assert mapping["Acme Corp"] == ("Q2", "Acme Corporation")
    assert mapping["Acme Corporation"] == ("Q2", "Acme Corporation")
    # Linked to Q60 but no KB name -> falls back to... Q60 IS absent? present.
    assert mapping["New York"] == ("Q60", "New York City")
    # NIL surface stays itself with a surface-derived id.
    assert mapping["Zorblat"] == ("S:zorblat", "Zorblat")


def test_mapping_multi_qid_component_min_id_wins(ray_session, kb):
    # One surface linked to two different qids across docs merges the qids
    # into one component; the numerically smallest qid is the representative.
    ds = _triples_ds(
        [
            ("c1", "Acme", "Q60", "x", "NIL"),
            ("c2", "Acme", "Q2", "x", "NIL"),
        ]
    )
    mapping = build_canonical_mapping(ds, kb)
    assert mapping["Acme"] == ("Q2", "Acme Corporation")


def test_case_folded_surface_equivalence(ray_session, kb):
    # "ACME corp" and "Acme Corp" share the normalized surface node; a link on
    # either casing canonicalizes both.
    ds = _triples_ds(
        [
            ("c1", "Acme Corp", "Q2", "x", "NIL"),
            ("c2", "ACME CORP", "NIL", "x", "NIL"),
        ]
    )
    mapping = build_canonical_mapping(ds, kb)
    assert mapping["ACME CORP"] == ("Q2", "Acme Corporation")


def test_apply_canonical_columns(ray_session, kb):
    ds = _triples_ds([("c1", "Acme Corp", "Q2", "Zorblat", "NIL")])
    out = canonicalize_triples(ds, kb).to_pandas()
    row = out.iloc[0]
    assert row["subj_canon"] == "Acme Corporation" and row["subj_canon_id"] == "Q2"
    assert row["obj_canon"] == "Zorblat" and row["obj_canon_id"] == "S:zorblat"


_CHAIN_ROWS = [
    # One multi-hop component: s1-Q2, bridge-Q2, bridge-Q60, s3-Q60 — the
    # min label must propagate two hops (s1 .. s3) through the bipartite
    # graph, exercising >1 propagation round.
    ("c1", "Acme Corp", "Q2", "pad1", "NIL"),
    ("c2", "The Bridge", "Q2", "pad2", "NIL"),
    ("c3", "The Bridge", "Q60", "pad3", "NIL"),
    ("c4", "Gotham", "Q60", "pad4", "NIL"),
    # Case-folded surface equivalence into the same component.
    ("c5", "ACME CORP", "NIL", "pad5", "NIL"),
    # Pure-NIL singleton surfaces.
    ("c6", "Zorblat", "NIL", "Blarg", "NIL"),
]


def test_distributed_mapping_matches_driver(ray_session, kb):
    from spacy_llm_ray.stages.canonicalize import build_canonical_mapping_dataset

    ds = _triples_ds(_CHAIN_ROWS)
    expected = build_canonical_mapping(_triples_ds(_CHAIN_ROWS), kb)
    got = {
        r["surface"]: (r["canon_id"], r["canon_name"])
        for r in build_canonical_mapping_dataset(ds, kb).take_all()
    }
    assert got == expected
    # The whole chain collapsed to one canonical entity.
    assert got["Gotham"] == ("Q2", "Acme Corporation")
    assert got["ACME CORP"] == ("Q2", "Acme Corporation")
    assert got["Zorblat"][0] == "S:zorblat"


def test_canonicalize_joined_matches_broadcast(ray_session, kb):
    from spacy_llm_ray.stages.canonicalize import (
        build_canonical_mapping_dataset,
        canonicalize_triples_joined,
    )

    mapping_ds = build_canonical_mapping_dataset(_triples_ds(_CHAIN_ROWS), kb)
    joined = (
        canonicalize_triples_joined(_triples_ds(_CHAIN_ROWS), mapping_ds)
        .to_pandas()
        .sort_values(["conv_id"])
        .reset_index(drop=True)
    )
    broadcast = (
        canonicalize_triples(_triples_ds(_CHAIN_ROWS), kb)
        .to_pandas()
        .sort_values(["conv_id"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        joined[sorted(joined.columns)], broadcast[sorted(broadcast.columns)]
    )


def test_kg_triples_distributed_canon_end_to_end(ray_session):
    """The full flagship pipeline with distributed_canon=True produces the
    identical canonical triple table to the default broadcast path."""
    from spacy_llm_ray.data import ensure_dataset
    from spacy_llm_ray.pipelines import kg

    sf = ensure_dataset("sf0.001")
    cols = list(kg.FINAL_COLUMNS)
    base = (
        kg.kg_triples_dataset(sf)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    dist = (
        kg.kg_triples_dataset(sf, distributed_canon=True)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(dist, base)


def test_canon_auto_route_by_pair_estimate(ray_session, monkeypatch):
    """r3 VERDICT #2: with distributed_canon unset, the route flips on the
    upper-bound pair estimate vs DRIVER_CANON_MAX_PAIRS — small corpora take
    the driver union-find, anything past the bound the distributed CC path —
    and the decision is recorded in CANON_ROUTE. Outputs are identical."""
    from spacy_llm_ray.data import ensure_dataset
    from spacy_llm_ray.pipelines import kg

    sf = ensure_dataset("sf0.001")
    cols = list(kg.FINAL_COLUMNS)

    base = kg.kg_triples_dataset(sf).to_pandas()[cols]
    route_small = dict(kg.CANON_ROUTE)
    assert route_small["route"] == "driver"
    assert not route_small["forced"]
    assert 0 < route_small["est_pairs"] <= kg.DRIVER_CANON_MAX_PAIRS

    # Shrink the bound below any real corpus: the auto-route must flip.
    monkeypatch.setattr(kg, "DRIVER_CANON_MAX_PAIRS", 1)
    routed = kg.kg_triples_dataset(sf).to_pandas()[cols]
    route_big = dict(kg.CANON_ROUTE)
    assert route_big["route"] == "distributed"
    assert route_big["threshold_pairs"] == 1
    assert not route_big["forced"]

    import pandas.testing as pdt

    pdt.assert_frame_equal(
        routed.sort_values(cols).reset_index(drop=True),
        base.sort_values(cols).reset_index(drop=True),
    )

    # Explicit override is honored and marked forced.
    kg.kg_triples_dataset(sf, distributed_canon=False).count()
    assert kg.CANON_ROUTE == {
        "threshold_pairs": 1,
        "est_pairs": None,
        "route": "driver",
        "forced": True,
    }


def test_canonicalize_joined_survives_schemaless_empty_blocks(ray_session, kb):
    """Regression: distinct_triples' sort-shuffle map_groups emits
    SCHEMA-LESS empty blocks whenever it has more output partitions than
    occupied buckets (a function of the session's block counts — warm
    sessions produced them where fresh ones didn't), and a schema-less
    block on a hash-join side dies in the aggregator with ArrowInvalid.
    canonicalize_triples_joined must rebuild its input blocks first."""
    from spacy_llm_ray.stages.canonicalize import (
        build_canonical_mapping_dataset,
        canonicalize_triples_joined,
    )

    # Deterministically manufacture the failing shape: 12 input partitions,
    # 3 occupied groups -> >= 9 schema-less empty output blocks.
    raw = _triples_ds(_CHAIN_ROWS)
    cols = raw.schema().names

    def add_bucket(batch):
        import pyarrow.compute as _pc

        n = batch.num_rows
        return batch.append_column(
            "_bucket", pa.array([i % 3 for i in range(n)], pa.int32())
        )

    bumpy = (
        raw.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(12)
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop(columns=["_bucket"]), batch_format="pandas"
        )
    )
    mapping_ds = build_canonical_mapping_dataset(_triples_ds(_CHAIN_ROWS), kb)
    joined = (
        canonicalize_triples_joined(bumpy, mapping_ds)
        .to_pandas()
        .sort_values(["conv_id"])
        .reset_index(drop=True)
    )
    broadcast = (
        canonicalize_triples(_triples_ds(_CHAIN_ROWS), kb)
        .to_pandas()
        .sort_values(["conv_id"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        joined[sorted(joined.columns)], broadcast[sorted(broadcast.columns)]
    )
