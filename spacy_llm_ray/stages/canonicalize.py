"""Canonicalization: connected components over surface-form equivalence.

The reference's closest analogue is label normalization
(/root/reference/spacy_llm/registry/normalizer.py:6-29); the north rule
requires full entity canonicalization: surfaces that share a linked KB id (or
a normalized surface form) merge into one canonical entity, with a
deterministic min-ID representative.

Distributed shape (SURVEY.md §2.7): the *distinct* (surface, qid) pair set is
many orders of magnitude smaller than the triple table (bounded by vocabulary,
not data volume), so we:

1. extract per-batch-deduped (surface, qid) pairs with ``map_batches``
   (a partial/combiner aggregation — the shuffle only moves distinct pairs),
2. collect the small distinct set to the driver,
3. run union-find there (nodes: normalized surfaces + qids; edges: links),
4. broadcast the resulting surface->canonical dict back through ``ray.put``
   and map it over the triple table — no join shuffle.

Component representative: smallest qid (numeric-aware) -> its KB name; pure
NIL components: smallest original surface.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pyarrow as pa

from ..kb import InMemoryKB
from ..normalizers import lowercase_normalizer
from ..tasks.entity_linker import NIL


def _extract_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch-deduped (surface, qid) pairs — vectorized combiner."""
    import pandas as pd

    frames = [
        pd.DataFrame(
            {
                "surface": batch[side].to_pandas(),
                "qid": batch[f"{side}_qid"].to_pandas().fillna(NIL).replace("", NIL),
            }
        )
        for side in ("subj", "obj")
    ]
    pairs = pd.concat(frames).drop_duplicates().sort_values(["surface", "qid"])
    from .arrow_utils import df_table

    return df_table(pairs)


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # Deterministic: smaller string becomes the root.
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _qid_sort_key(qid: str):
    if qid.startswith("Q") and qid[1:].isdigit():
        return (0, int(qid[1:]), qid)
    return (1, 0, qid)


def build_canonical_mapping(
    triples_ds, kb: InMemoryKB
) -> Dict[str, Tuple[str, str]]:
    """surface -> (canonical id, canonical name) from the distinct
    (surface, qid) pairs of a triples Dataset."""
    distinct = set()
    # Per-batch dedup happened in _extract_pairs; final dedup on the driver
    # over the (small) union of distinct pairs.
    for b in triples_ds.map_batches(_extract_pairs, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        distinct.update(zip(b["surface"].to_pylist(), b["qid"].to_pylist()))

    uf = _UnionFind()
    for surface, qid in sorted(distinct):
        snode = "s:" + lowercase_normalizer(surface)
        uf.find(snode)
        if qid != NIL:
            uf.union(snode, "q:" + qid)

    # Gather members per component.
    comp_qids: Dict[str, set] = {}
    comp_surfaces: Dict[str, set] = {}
    for surface, qid in sorted(distinct):
        root = uf.find("s:" + lowercase_normalizer(surface))
        comp_surfaces.setdefault(root, set()).add(surface)
        if qid != NIL:
            comp_qids.setdefault(root, set()).add(qid)

    mapping: Dict[str, Tuple[str, str]] = {}
    for root, surfaces in comp_surfaces.items():
        qids = comp_qids.get(root, set())
        if qids:
            canon_qid = min(qids, key=_qid_sort_key)
            canon_name = kb.get_entity_name(canon_qid) or min(surfaces)
            canon_id = canon_qid
        else:
            canon_name = min(surfaces)
            canon_id = "S:" + lowercase_normalizer(canon_name)
        for surface in surfaces:
            mapping[surface] = (canon_id, canon_name)
    return mapping


# Worker-process-level cache of fetched/split mappings keyed by ObjectRef:
# the apply stage runs as plain tasks (no actor-pool startup cost), and each
# reused worker process deserializes the broadcast dict exactly once.
# Bounded (FIFO): long-lived task workers see one ref per canonicalize call
# across a session; unbounded growth pins every broadcast mapping forever.
_MAPPING_CACHE: Dict = {}
_MAPPING_CACHE_MAX = 4


def _split_mapping(mapping_ref):
    try:
        import ray

        if isinstance(mapping_ref, ray.ObjectRef):
            cached = _MAPPING_CACHE.get(mapping_ref)
            if cached is not None:
                return cached
            mapping = ray.get(mapping_ref)
            split = (
                {s: c[0] for s, c in mapping.items()},
                {s: c[1] for s, c in mapping.items()},
            )
            while len(_MAPPING_CACHE) >= _MAPPING_CACHE_MAX:
                _MAPPING_CACHE.pop(next(iter(_MAPPING_CACHE)))
            _MAPPING_CACHE[mapping_ref] = split
            return split
    except ImportError:
        pass
    return (
        {s: c[0] for s, c in mapping_ref.items()},
        {s: c[1] for s, c in mapping_ref.items()},
    )


def _apply_canonical(batch: pa.Table, mapping_ref=None) -> pa.Table:
    id_map, name_map = _split_mapping(mapping_ref)
    for side in ("subj", "obj"):
        surfaces = batch[side].to_pandas()
        ids = surfaces.map(id_map)
        names = surfaces.map(name_map)
        missing = ids.isna()
        if missing.any():
            fallback = surfaces[missing]
            ids.loc[missing] = fallback.map(lambda s: "S:" + lowercase_normalizer(s))
            names.loc[missing] = fallback
        batch = batch.append_column(f"{side}_canon_id", pa.array(ids.tolist()))
        batch = batch.append_column(f"{side}_canon", pa.array(names.tolist()))
    return batch


# ---------------------------------------------------------------------------
# Fully distributed mapping (100-TB path).
#
# The driver union-find above is bounded by VOCABULARY (distinct surface/qid
# pairs), which is fine up to ~10^7 pairs. Past that — open-domain corpora
# where surface forms grow with data — the variant below computes the same
# mapping with no driver-side pair set: connected components via alternating
# min-label propagation over the bipartite surface<->qid graph (the
# "hash-to-min" scheme of Rastogi et al., converges in O(diameter) rounds;
# entity-link components are shallow, so 2-4 rounds in practice). Each round
# is two small hash joins + two bucketed group-mins over the DISTINCT pair
# set — never the triple table.
# ---------------------------------------------------------------------------


_LBL = pa.schema([("snode", pa.string()), ("label", pa.string())])


def _default_partitions() -> int:
    """Output-block / join-partition count for the vocab-scale CC datasets:
    scale with the cluster instead of a constant so the distributed path
    keeps its parallelism at the 10^7+-pair scale it exists for."""
    try:
        import ray

        if ray.is_initialized():
            return max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        pass
    return 8


def _bucketed_group_min(
    ds, key: str, val: str, out_schema, n_buckets: int = 32, n_out: int = None
):
    """min(val) per key via hash-bucket groupby (vocab-scale data)."""
    import pandas as pd

    from .arrow_utils import pandas_udf

    def add_b(batch: pa.Table) -> pa.Table:
        h = (
            pd.util.hash_pandas_object(batch[key].to_pandas(), index=False).to_numpy()
            % n_buckets
        )
        return batch.append_column("_b", pa.array(h.astype("int32")))

    def gmin(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False)[val].min()

    out = (
        ds.map_batches(add_b, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pandas_udf(gmin), batch_format="pandas")
    )
    # Pin the schema: map_groups emits schema-less empty blocks for empty
    # buckets, which downstream joins reject.
    def coerce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key not in batch.column_names:
            return out_schema.empty_table()
        return batch.select([f.name for f in out_schema]).cast(out_schema)

    # repartition: map_groups emits schema-less empty blocks for empty
    # buckets; they BYPASS map_batches UDFs (so coerce can't fix them) and
    # crash any downstream hash join — rebuilding blocks drops them.
    return out.map_batches(coerce, batch_format="pyarrow").repartition(
        n_out or _default_partitions()
    )


def distinct_pairs_dataset(triples_ds, n_buckets: int = 32):
    """Globally distinct (surface, qid, snode) pairs of a triples Dataset."""
    import pandas as pd

    from .arrow_utils import pandas_udf

    def add_cols(batch: pa.Table) -> pa.Table:
        surf = batch["surface"].to_pandas()
        snode = "s:" + surf.str.strip().str.lower()  # lowercase_normalizer, vectorized
        h = (
            pd.util.hash_pandas_object(surf, index=False).to_numpy() % n_buckets
        )
        return batch.append_column("snode", pa.array(snode.tolist())).append_column(
            "_b", pa.array(h.astype("int32"))
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["surface", "qid", "snode"]].drop_duplicates()

    schema = pa.schema(
        [("surface", pa.string()), ("qid", pa.string()), ("snode", pa.string())]
    )

    out = (
        triples_ds.map_batches(_extract_pairs, batch_format="pyarrow")
        .map_batches(add_cols, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pandas_udf(dedup), batch_format="pandas")
    )

    def coerce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "surface" not in batch.column_names:
            return schema.empty_table()
        return batch.select(["surface", "qid", "snode"]).cast(schema)

    # See _bucketed_group_min: rebuild blocks so map_groups empties never
    # reach a join.
    return out.map_batches(coerce, batch_format="pyarrow").repartition(
        _default_partitions()
    )


def build_canonical_mapping_dataset(
    triples_ds, kb: InMemoryKB, *, max_iters: int = 25, num_partitions: int = None
):
    """Distributed equivalent of :func:`build_canonical_mapping`.

    Returns a Dataset with columns (surface, canon_id, canon_name) — byte-
    equal to the driver union-find mapping (tested) — built without ever
    materializing the pair set on one machine.
    """
    import pandas as pd

    from .arrow_utils import pandas_udf

    pairs = distinct_pairs_dataset(triples_ds).materialize()
    if num_partitions is None:
        # Scale with DATA, capped by the cluster: Ray's hash-join overhead
        # grows with the partition count (~0.1 s/partition locally), so a
        # vocab of a few thousand pairs should run 2-partition joins while
        # 10^7+ pairs get the full cluster fan-out (~100k pairs/partition).
        num_partitions = int(
            min(_default_partitions(), max(2, pairs.count() // 100_000))
        )

    # Bipartite edges: normalized surface node <-> non-NIL qid.
    edges = pairs.filter(
        expr=f"qid != '{NIL}'"
    ).map_batches(
        lambda b: b.select(["snode", "qid"]), batch_format="pyarrow"
    ).materialize()

    # Init: every snode labels itself. ("s|" > "q|" lexicographically, so a
    # component's min label becomes its min qid node once one propagates in.)
    def init_labels(batch: pa.Table) -> pa.Table:
        sn = pa.array(sorted(set(batch["snode"].to_pylist())))
        import pyarrow.compute as pc

        return pa.table(
            {"snode": sn, "label": pc.binary_join_element_wise("s|", sn, "")}
        )

    labels = (
        pairs.map_batches(init_labels, batch_format="pyarrow")
        .map_batches(
            lambda b: b.cast(_LBL), batch_format="pyarrow"
        )
    )
    # Global distinct over per-batch inits.
    labels = _bucketed_group_min(
        labels, "snode", "label", _LBL, n_out=num_partitions
    ).materialize()

    qlab_schema = pa.schema([("qid", pa.string()), ("qlabel", pa.string())])
    cand_schema = pa.schema([("snode", pa.string()), ("cand", pa.string())])

    for _ in range(max_iters):
        # q-side: min over incident snode labels, then own key.
        e1 = edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("snode",),
        ).map_batches(
            lambda b: pa.table({"qid": b["qid"], "qlabel": b["label"]}),
            batch_format="pyarrow",
        )
        lq = _bucketed_group_min(e1, "qid", "qlabel", qlab_schema, n_out=num_partitions)

        def own_q(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                # pandas round-trips on empty blocks degrade string columns
                # to null type, which breaks the downstream hash join.
                return qlab_schema.empty_table()
            df = batch.to_pandas()
            own = "q|" + df["qid"]
            df["qlabel"] = df["qlabel"].where(df["qlabel"] < own, own)
            from .arrow_utils import df_table

            return df_table(df)

        lq = lq.map_batches(own_q, batch_format="pyarrow")

        # s-side: min over incident qid labels.
        e2 = edges.join(
            lq, join_type="inner", num_partitions=num_partitions, on=("qid",)
        ).map_batches(
            lambda b: pa.table({"snode": b["snode"], "cand": b["qlabel"]}),
            batch_format="pyarrow",
        )
        cand = _bucketed_group_min(
            e2, "snode", "cand", cand_schema, n_out=num_partitions
        )

        # Element-wise min with previous labels; left join keeps edge-less
        # singleton snodes.
        merged = labels.join(
            cand,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("snode",),
        )

        _min_schema = pa.schema(
            [("snode", pa.string()), ("label", pa.string()), ("chg", pa.int64())]
        )

        def take_min(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _min_schema.empty_table()
            df = batch.to_pandas()
            better = df["cand"].notna() & (df["cand"] < df["label"])
            df["chg"] = better.astype("int64")
            df.loc[better, "label"] = df.loc[better, "cand"]
            from .arrow_utils import df_table

            return df_table(df[["snode", "label", "chg"]])

        merged = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        changed = merged.sum("chg")
        labels = merged.map_batches(
            lambda b: b.select(["snode", "label"]).cast(_LBL),
            batch_format="pyarrow",
        ).materialize()
        if not changed:
            break
    else:
        # Silent non-convergence would split true components and break the
        # byte-identical contract with the broadcast union-find path.
        raise RuntimeError(
            f"canonical label propagation did not converge in {max_iters} "
            "rounds (component diameter exceeds 2*max_iters); raise max_iters"
        )

    # Per-component canonical pick (comp tables are vocab-scale).
    kb_names = {qid: ent[0] for qid, ent in kb.entities.items()}

    with_comp = pairs.join(
        labels, join_type="inner", num_partitions=num_partitions, on=("snode",)
    ).map_batches(
        lambda b: pa.table(
            {"surface": b["surface"], "qid": b["qid"], "comp": b["label"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    def add_cb(batch: pa.Table) -> pa.Table:
        h = (
            pd.util.hash_pandas_object(batch["comp"].to_pandas(), index=False)
            .to_numpy()
            % 32
        )
        return batch.append_column("_b", pa.array(h.astype("int32")))

    def canon_rows(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for comp, sub in g.groupby("comp", sort=False):
            qids = sorted(
                {q for q in sub["qid"] if q != NIL}, key=_qid_sort_key
            )
            min_surface = sub["surface"].min()
            if qids:
                cid = qids[0]
                name = kb_names.get(cid) or min_surface
            else:
                name = min_surface
                cid = "S:" + lowercase_normalizer(name)
            out.append((comp, cid, name))
        return pd.DataFrame(out, columns=["comp", "canon_id", "canon_name"])

    canon_schema = pa.schema(
        [("comp", pa.string()), ("canon_id", pa.string()), ("canon_name", pa.string())]
    )
    comp_canon = (
        with_comp.map_batches(add_cb, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pandas_udf(canon_rows), batch_format="pandas")
    )

    def coerce_canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "comp" not in batch.column_names:
            return canon_schema.empty_table()
        return batch.select(["comp", "canon_id", "canon_name"]).cast(canon_schema)

    comp_canon = comp_canon.map_batches(
        coerce_canon, batch_format="pyarrow"
    ).repartition(num_partitions)

    surf_schema = pa.schema([("surface", pa.string()), ("comp", pa.string())])
    surf_comp = _bucketed_group_min(
        with_comp.map_batches(
            lambda b: b.select(["surface", "comp"]), batch_format="pyarrow"
        ),
        "surface",
        "comp",
        surf_schema,
        n_out=num_partitions,
    )
    return surf_comp.join(
        comp_canon, join_type="inner", num_partitions=num_partitions, on=("comp",)
    ).map_batches(
        lambda b: b.select(["surface", "canon_id", "canon_name"]),
        batch_format="pyarrow",
    ).repartition(num_partitions)  # joins also emit schema-less empties


def canonicalize_triples_joined(
    triples_ds, mapping_ds, num_partitions: Optional[int] = None
):
    """Join-based apply for when the mapping exceeds driver/broadcast size:
    two hash joins (subj, obj) against the (surface, canon_id, canon_name)
    mapping Dataset instead of a broadcast dict. Output columns match
    :func:`canonicalize_triples`.

    ``num_partitions`` defaults byte-derived from the triple table (~64 MB
    per join partition, floored at the cluster default) when its size is
    known (materialized input), else to the cluster default.
    """
    if num_partitions is None:
        sz = None
        try:
            from ray.data.dataset import MaterializedDataset

            if isinstance(triples_ds, MaterializedDataset):
                sz = triples_ds.size_bytes()
        except Exception:
            sz = None
        num_partitions = (
            int(max(_default_partitions(), -(-sz // (64 << 20))))
            if sz
            else _default_partitions()
        )
    # Rebuild the input blocks before the first join: the distinct-triples
    # groupby upstream (sort-shuffle map_groups) emits SCHEMA-LESS empty
    # blocks whenever it has more output partitions than occupied groups —
    # how many depends on the session's block counts, so a warm session can
    # produce them where a fresh one doesn't — and a schema-less block on
    # either side of a hash join dies in the aggregator with ArrowInvalid
    # ("No match ... for key field reference"). repartition rebuilds blocks
    # and drops the empties (same guard as _bucketed_group_min's tail).
    out = triples_ds.repartition(num_partitions)
    for side in ("subj", "obj"):
        m = mapping_ds.map_batches(
            lambda b, s=side: pa.table(
                {
                    f"_{s}_key": b["surface"],
                    f"{s}_canon_id": b["canon_id"],
                    f"{s}_canon": b["canon_name"],
                }
            ),
            batch_format="pyarrow",
        )
        out = out.join(
            m,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(side,),
            right_on=(f"_{side}_key",),
        ).repartition(num_partitions)  # rebuild blocks: a join's empty
        # output blocks are schema-less and crash the next join

    def fill_missing(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        for side in ("subj", "obj"):
            missing = df[f"{side}_canon_id"].isna()
            if missing.any():
                fallback = df.loc[missing, side]
                df.loc[missing, f"{side}_canon_id"] = fallback.map(
                    lambda s: "S:" + lowercase_normalizer(s)
                )
                df.loc[missing, f"{side}_canon"] = fallback
        drop = [c for c in df.columns if c.startswith("_")]
        from .arrow_utils import df_table

        return df_table(df.drop(columns=drop))

    return out.map_batches(fill_missing, batch_format="pyarrow")


def canonicalize_triples(triples_ds, kb: InMemoryKB, mapping=None):
    """Append subj_canon/obj_canon (+ canonical ids) to a triples Dataset.

    The mapping is computed from the dataset itself unless provided. NOTE:
    computing it consumes ``triples_ds`` once — pass a re-readable dataset or
    a precomputed mapping in streaming contexts.
    """
    import ray

    if mapping is None:
        mapping = build_canonical_mapping(triples_ds, kb)
    ref = ray.put(mapping)
    return triples_ds.map_batches(
        _apply_canonical,
        fn_kwargs={"mapping_ref": ref},
        batch_format="pyarrow",
    )
