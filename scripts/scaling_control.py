"""Hardware-scaling control: no Ray in the measured section.

Runs the IDENTICAL fused extraction kernel (stages.llm_stage.KGStage — the
stage that dominates the headline pipeline) over the same pre-assembled
documents with a plain ``multiprocessing.Pool`` of N workers. This isolates
what the single box's hardware (DRAM bandwidth, SMT sharing) allows from
anything Ray adds or costs: if this control scales at efficiency E between
two worker counts, no engine running the same kernel on this machine can
evidence better than ~E at those levels — separate cluster nodes each bring
their own memory bandwidth, so the ceiling is a single-box artifact, not an
engine property.

Usage: python scripts/scaling_control.py <workers> [turns]
  (first call materializes the assembled docs to /tmp once, using Ray
   only for that setup step, outside the timed section)
"""
import multiprocessing as mp
import os
import sys
import time

# Importable regardless of invoker cwd (bench.py --scaling runs this as a
# subprocess; the script dir, not the repo root, is what Python puts on
# sys.path for `python scripts/scaling_control.py`).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

TURNS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_920_000
DOCS_PATH = f"/tmp/spacy_llm_ray_data/control_docs_{TURNS}.parquet"

_stage = None
_tbl = None


def _init():
    global _stage, _tbl
    from spacy_llm_ray.data import build_kb
    from spacy_llm_ray.pipelines import kg
    from spacy_llm_ray.stages.llm_stage import KGStage

    models = kg.default_models()
    _stage = KGStage(
        ner_kwargs=dict(labels=kg.LABELS_NER, model=models["ner"]),
        rel_kwargs=dict(labels=kg.LABELS_REL, model=models["rel"]),
        el_kwargs=dict(kb=build_kb(), model=models["el"]),
    )
    # Read once per worker, OUTSIDE the timed section (a warmup map drains
    # initializers before t0). Re-reading the file per chunk would scale
    # total I/O/decode work with worker count and bias the efficiency
    # measurement this script exists for.
    _tbl = pq.read_table(DOCS_PATH)


def _warm(_):
    return _tbl.num_rows


def _work(span):
    i0, i1 = span
    tbl = _tbl.slice(i0, i1 - i0)  # zero-copy view of the cached table
    out = 0
    batch = 64  # same minibatch size as the Ray stage
    for j in range(0, tbl.num_rows, batch):
        out += _stage(tbl.slice(j, batch)).num_rows
    return out


def _ensure_docs():
    if os.path.exists(DOCS_PATH):
        return
    import pyarrow as pa
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from spacy_llm_ray.data import ensure_dataset
    from spacy_llm_ray.pipelines import kg

    sf = ensure_dataset(TURNS)
    docs = kg.documents_dataset(sf, max_doc_turns=kg.MAX_DOC_TURNS)
    df = docs.to_pandas()[["conv_id", "text"]]
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), DOCS_PATH)
    ray.shutdown()


def main():
    nwork = int(sys.argv[1])
    _ensure_docs()
    n = pq.read_metadata(DOCS_PATH).num_rows
    nchunk = nwork * 8  # 8 chunks per worker for load balance
    step = (n + nchunk - 1) // nchunk
    spans = [(i, min(i + step, n)) for i in range(0, n, step)]
    with mp.Pool(nwork, initializer=_init) as pool:
        pool.map(_warm, range(nwork * 4))  # drain initializers pre-timing
        t0 = time.monotonic()
        total = sum(pool.map(_work, spans))
        dt = time.monotonic() - t0
    import json

    print(
        json.dumps(
            {
                "metric": "extraction_mp_control",
                "unit": "sec",
                "workers": nwork,
                "turns": TURNS,
                "value": round(dt, 2),
                "triples_raw": total,
            }
        )
    )


if __name__ == "__main__":
    main()
