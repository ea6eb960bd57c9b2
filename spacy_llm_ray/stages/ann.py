"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul, per-batch top-k partials are
merged in a tiny driver reduce (classic partial-topk combiner: the shuffleless
aggregation shape from the ray guide).

Scale path: IVF — k-means-lite coarse centroids (sampled, seeded), each vector
assigned to its nearest centroid in a map_batches; queries probe only the
``nprobe`` nearest centroid partitions.
"""

from __future__ import annotations

import heapq
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1
    return m / norms


class _BatchTopK:
    """Per-batch cosine top-k against the broadcast query matrix; emits
    (query_id, vec_id, score) partials."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        # float64 so scores match a double-precision SQL oracle bit-for-bit
        # modulo summation order (ranks, not scores, are emitted).
        self._qids = np.array([qi for qi, _ in q])
        self._qm = _normalize(np.stack([v for _, v in q]).astype(np.float64))
        self._k = k
        self._vec_col = vec_col
        self._id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[self._vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(batch[self._id_col].to_pylist())
        sims = _normalize(vecs) @ self._qm.T  # (n, q)
        k = min(self._k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([int(self._qids[qi])] * k)
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(
    emb_ds,
    queries: List[tuple],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partial top-k -> driver heap merge.
    ``queries``: list of (query_id, vector). Returns a pandas DataFrame
    (query_id, vec_id, rank) with deterministic (score desc, vec_id asc)
    tie-breaking."""
    import ray

    ref = ray.put(queries)
    partials = emb_ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    heaps = {}
    for b in partials.iter_batches(batch_format="pandas"):
        for qid, vid, score in zip(b["query_id"], b["vec_id"], b["score"]):
            heaps.setdefault(int(qid), []).append((float(score), int(vid)))
    rows = []
    for qid in sorted(heaps):
        best = heapq.nlargest(k, heaps[qid], key=lambda sv: (sv[0], -sv[1]))
        for rank, (score, vid) in enumerate(best, start=1):
            rows.append((qid, vid, rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"]).astype("int64")


# ------------------------------------------------------------------- IVF

def build_centroids(emb_ds, n_centroids: int = 16, sample: int = 2048,
                    vec_col: str = "embedding", seed: int = 11, iters: int = 5):
    """k-means-lite centroids from a seeded sample (driver-side; the sample is
    tiny)."""
    rows = emb_ds.random_sample(min(1.0, sample / max(1, emb_ds.count())), seed=seed).take_all()
    X = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float32))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for ci in range(C.shape[0]):
            members = X[assign == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(
    emb_ds,
    queries: List[tuple],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF ANN: assign vectors to coarse centroids (one map_batches), search
    only the nprobe closest centroid partitions per query."""
    import ray

    C = build_centroids(emb_ds, n_centroids, vec_col=vec_col)
    c_ref = ray.put(C)

    class _Assign:
        def __init__(self, c_ref):
            self._C = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float32))
            cid = np.argmax(vecs @ self._C.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(cid))

    assigned = emb_ds.map_batches(
        _Assign, fn_constructor_kwargs=dict(c_ref=c_ref),
        batch_format="pyarrow", concurrency=(1, 4),
    )

    qm = _normalize(np.stack([v for _, v in queries]).astype(np.float32))
    probe = np.argsort(-(qm @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    wanted = sorted({c for s in probe_sets for c in s})

    filtered = assigned.filter(lambda r: r["centroid"] in set(wanted))
    rows = filtered.take_all()
    out = []
    ids = np.array([r[id_col] for r in rows])
    cids = np.array([r["centroid"] for r in rows])
    V = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float32))
    for qi, (qid, _) in enumerate(queries):
        mask = np.isin(cids, list(probe_sets[qi]))
        sims = V[mask] @ qm[qi]
        sub_ids = ids[mask]
        order = sorted(zip(sims.tolist(), (-sub_ids).tolist(), sub_ids.tolist()),
                       reverse=True)[:k]
        for rank, (_, _, vid) in enumerate(order, start=1):
            out.append((int(qid), int(vid), rank))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "rank"]).astype("int64")
