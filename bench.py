"""Benchmark harness.

Headline: full KG-construction pipeline (transcripts -> documents -> NER ->
REL -> EL -> canonical distinct triples) over the sf-matched synthetic
transcript table, with the default (sharded, context 4097) model config.

Prints ONE JSON line:
  {"metric": "kg_pipeline", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": N}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).

``--scaling``: run the headline in fresh processes at two parallelism levels
(default num_cpus=2 and 8; override via BENCH_SCALING_CPUS="lo,hi") on the
same input and report both throughputs + scaling efficiency (sandbox
stand-in for the N vs 4N node criterion). See the level-choice rationale at
the --scaling branch below and scripts/scaling_control.py for the no-Ray
hardware control.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# --------------------------------------------------------------- calibration
# r4 VERDICT #1: the sustained-bench box drifts (same-commit headline
# samples spanned 2.1-5.9 s across rounds), so box drift vs code regression
# must be decidable from ONE bench JSON. Every run first times a FROZEN
# pure-CPU reference kernel (same primitive mix as the engine's hot paths:
# regex tokenize, md5 word hashes, uint64 polynomial windows, a pandas
# groupby, a small matmul — but engine-code-independent, so engine
# optimizations can never move it) and reports every timing both raw and
# normalized by the kernel's drift factor. NEVER edit the kernel without
# bumping the version and re-recording the reference constant.
_CALIBRATION_VERSION = "cal-v1"
#: Kernel walls on this box in the state the round-5 reference numbers
#: were recorded (see BASELINE.md "Calibration"). TWO reference points:
#: single-thread wall AND the wall of 2xN kernels on an N-process pool —
#: measured here, the box's drift shows up ~2x stronger under multi-core
#: load than single-thread (contention/steal), and the engine's 32-CPU
#: walls track the PARALLEL factor, so normalization uses it.
_CALIBRATION_REF_SEC = 0.80
_CALIBRATION_PAR_REF_SEC = 1.95
_CALIBRATION_PAR_PROCS = 8


def calibration_kernel() -> float:
    """Fixed single-process CPU workload; returns its wall seconds."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    t0 = time.monotonic()
    rng = np.random.RandomState(7)
    word_re = re.compile(r"\w+")
    vocab = [f"tok{i:04d}" for i in range(2000)]
    idx = rng.randint(0, 2000, size=(4000, 120))
    texts = [" ".join(vocab[j] for j in row) for row in idx]
    acc = 0
    for t in texts:
        ws = word_re.findall(t.lower())
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for w in ws
            ),
            dtype=np.uint64,
            count=len(ws),
        )
        m = len(h) - 2
        a = np.zeros(m, dtype=np.uint64)
        for k in range(3):
            a = a * np.uint64(1099511628211) + h[k : k + m]
        acc ^= int(np.unique(a)[0])
    df = pd.DataFrame(
        {"k": rng.randint(0, 64, 300_000), "v": rng.randn(300_000)}
    )
    df.groupby("k")["v"].agg(["sum", "count"])
    x = rng.randn(384, 256)
    for _ in range(30):
        acc ^= int(abs(x @ x.T).sum()) & 0xFF
    assert acc >= 0  # keep the work observable
    return time.monotonic() - t0


def _cal_child(_i):
    return calibration_kernel()


def calibration_parallel_sec() -> float:
    """Wall of 2xN kernels on an N-process pool: samples the box's
    MULTI-CORE throughput, which is what the engine's 32-CPU walls track
    (measured: a phase where the single-thread kernel drifted 1.44x
    inflated the 32-CPU headline 2.8x)."""
    import multiprocessing as mp

    n = _CALIBRATION_PAR_PROCS
    # spawn, not fork: run_bench() calls this AFTER ray.init, and forking
    # a live Ray driver (its gRPC/raylet threads) can deadlock the child.
    # The timed section is unaffected — pool startup and the warm-up map
    # are untimed, so the recorded _CALIBRATION_PAR_REF_SEC stays valid.
    with mp.get_context("spawn").Pool(n) as pool:
        pool.map(_cal_child, range(n))  # warm the workers, untimed
        t0 = time.monotonic()
        pool.map(_cal_child, range(2 * n))
        return time.monotonic() - t0


def run_calibration() -> dict:
    """Kernel walls + drift factors vs the recorded references. The
    headline-normalizing ``drift_factor`` is the PARALLEL one; the
    single-thread factor is reported alongside for diagnosis (parallel >>
    single-thread drift = core contention; both high = the whole box)."""
    walls = sorted(calibration_kernel() for _ in range(3))
    sec = walls[1]
    par = calibration_parallel_sec()
    drift_st = (
        round(sec / _CALIBRATION_REF_SEC, 3) if _CALIBRATION_REF_SEC else None
    )
    drift = (
        round(par / _CALIBRATION_PAR_REF_SEC, 3)
        if _CALIBRATION_PAR_REF_SEC
        else drift_st
    )
    return {
        "calibration_version": _CALIBRATION_VERSION,
        "calibration_sec": round(sec, 3),
        "calibration_runs": [round(w, 3) for w in walls],
        "calibration_ref_sec": _CALIBRATION_REF_SEC,
        "calibration_parallel_sec": round(par, 3),
        "calibration_parallel_ref_sec": _CALIBRATION_PAR_REF_SEC,
        "calibration_parallel_procs": _CALIBRATION_PAR_PROCS,
        "drift_factor_single_thread": drift_st,
        "drift_factor": drift,
    }


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from spacy_llm_ray.data import ensure_dataset
    from spacy_llm_ray.pipelines import kg
    from spacy_llm_ray.pipelines.queries import QUERIES

    data_dir = ensure_dataset(SF_DIR)
    # Warm the page cache so we measure compute + shuffle, not first disk read.
    import pyarrow.parquet as pq

    n_turns = pq.read_table(f"{data_dir}/transcripts.parquet", columns=["turn_idx"]).num_rows

    # Calibration FIRST (immediately before the headline), so every timing
    # below can be read against the box's state during this very run.
    cal = run_calibration()

    # ---- headline: full KG pipeline (sharded default config).
    # Four runs; the headline is the MEDIAN of runs 2-4 (steady state):
    # run 1 pays one-off Ray worker spawn / package import / page-cache
    # costs irrelevant to steady-state throughput, and a single
    # steady-state sample measured +-35% scheduler variance at sf0.1
    # (r5: 2.6 vs 3.9 s back-to-back at identical calibration). All runs
    # are recorded (headline_runs[0] = cold) — a median over disclosed
    # samples, not best-of-N selection.
    runs = []
    n_triples = 0
    for _ in range(4):
        t0 = time.monotonic()
        n_triples = kg.kg_triples_dataset(SF_DIR).count()
        runs.append(round(time.monotonic() - t0, 3))
    headline = sorted(runs[1:])[1]

    # ---- representative per-operator timings (skipped for headline-only
    # scaling children, whose GRAFT_SF_DIR has no testdata tables)
    timings = {}
    names = () if os.environ.get("BENCH_HEADLINE_ONLY") else (
        "q1_pricing_summary",
        "q3_top_orders",
        "events_sessions",
        "events_last_order_asof",
        "docs_minhash_dedup",
        "docs_ngram_jaccard",
        "docs_curation",
        "docs_dup_spans",
        "docs_simhash",
        "ann_cosine_topk",
        "ann_ivf_topk",
        "task_lemma",
        "task_raw_rest",
        "kg_doc_assembly",
    )
    for name in names:
        fn = QUERIES[name][0]
        t0 = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()  # consume the lazy Dataset
        timings[name] = round(time.monotonic() - t0, 3)

    spilled_mb = _spilled_mb()
    ray.shutdown()
    drift = cal["drift_factor"] or 1.0
    return {
        "metric": "kg_pipeline",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "n_triples": n_triples,
        "headline_runs": runs,
        "headline_metric": "steady_state (median of runs 2-4; run 1 = cold start)",
        "turns_per_sec": round(n_turns / headline, 1),
        "object_store_spilled_mb": spilled_mb,
        # Box-drift calibration (r4 VERDICT #1): *_normalized = raw /
        # drift_factor, i.e. the wall this run WOULD have taken with the
        # reference box state. Read value_normalized against past rounds;
        # a normalized regression is code, a raw-only regression is box.
        **cal,
        "value_normalized": round(headline / drift, 3),
        "queries_normalized": {
            k: round(v / drift, 3) for k, v in timings.items()
        },
    }


def _spilled_mb():
    """Object-store spill during this session, MiB (None if unreadable) —
    scaling runs record it so a level pair bottlenecked on spill I/O rather
    than compute is visible in the artifact. Parsed from the session's
    raylet log ("Spilled N MiB" lines are cumulative; take the max) — the
    grpc-backed memory_summary API is unavailable in this container."""
    try:
        import re

        import ray

        node = ray._private.worker._global_node
        path = os.path.join(node.get_session_dir_path(), "logs", "raylet.out")
        spilled = 0
        if os.path.exists(path):
            pat = re.compile(r"Spilled (\d+) MiB")
            with open(path, errors="ignore") as f:
                for line in f:
                    m = pat.search(line)
                    if m:
                        spilled = max(spilled, int(m.group(1)))
        return spilled
    except Exception:
        return None


def run_single_stream() -> dict:
    """Reference-execution-model baseline: the reference processes documents
    as ONE lazy Python stream of minibatches (LLMWrapper.pipe, batch_size=128,
    n_process=1 default — pipeline/llm.py:195-207). This mode runs the SAME
    task semantics (our codecs, which skip spaCy's tokenizer overhead — a
    generous stand-in since the reference publishes no numbers) through a
    single in-process loop over the same input, giving the single-node
    throughput the engine must match or beat."""
    import pyarrow as pa

    from spacy_llm_ray.data import ensure_dataset, build_kb
    from spacy_llm_ray.data.transcripts import SF_TURNS  # noqa: F401
    import pyarrow.parquet as pq
    import pandas as pd

    data_dir = ensure_dataset(SF_DIR)
    t_all = pq.read_table(
        f"{data_dir}/transcripts.parquet",
        columns=["conv_id", "turn_idx", "role", "text"],
    )
    n_turns = t_all.num_rows

    from spacy_llm_ray.pipelines import kg
    from spacy_llm_ray.stages.llm_stage import KGStage

    t0 = time.monotonic()
    # Assembly, single process (pandas groupby-sort-concat).
    df = t_all.to_pandas().sort_values(["conv_id", "turn_idx"])
    df["chunk"] = df["turn_idx"] // kg.MAX_DOC_TURNS
    docs = (
        df.groupby(["conv_id", "chunk"], sort=False)["text"]
        .agg("\n".join)
        .reset_index()
    )
    models = kg.default_models()
    stage = KGStage(
        ner_kwargs=dict(labels=kg.LABELS_NER, model=models["ner"]),
        rel_kwargs=dict(labels=kg.LABELS_REL, model=models["rel"]),
        el_kwargs=dict(kb=build_kb(), model=models["el"]),
    )
    n_raw = 0
    batch = 128  # the reference's pipe() minibatch size
    for i in range(0, len(docs), batch):
        chunk = docs.iloc[i : i + batch]
        tbl = pa.table({"conv_id": chunk["conv_id"].tolist(),
                        "text": chunk["text"].tolist()})
        n_raw += stage(tbl).num_rows
    # Canonicalize + distinct single-process equivalents are negligible next
    # to extraction; include a pandas distinct for completeness.
    dt = time.monotonic() - t0
    return {
        "metric": "kg_pipeline_single_stream",
        "value": round(dt, 3),
        "unit": "sec",
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": 1,
        "turns": n_turns,
        "n_raw_triples": n_raw,
        "turns_per_sec": round(n_turns / dt, 1),
    }


def run_control(nwork: int, turns: int) -> dict:
    """One LIVE run of the no-Ray multiprocessing hardware control
    (scripts/scaling_control.py) — r4 VERDICT #3: the control numbers must
    be measured by THIS run on THIS box, not recorded constants from a
    prior round whose kernel was slower."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "scaling_control.py"),
            str(nwork),
            str(turns),
        ],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_child(ncpu: int, sf_dir: str = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    if sf_dir:
        env["GRAFT_SF_DIR"] = sf_dir
        env["BENCH_HEADLINE_ONLY"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--single" in sys.argv:
        print(json.dumps(run_single_stream()))
        return
    if "--scaling" in sys.argv:
        # N -> 4N scaling on the SAME compute-dominated input (default 1.92M
        # turns, 32x the sf0.1 table): single-node fixed costs (actor-pool
        # startup, shuffle-barrier latency, driver-side canonical reduce)
        # are irrelevant at cluster scale but would otherwise mask the
        # parallel fraction. The artifact is SELF-CONTAINED (r3 VERDICT #6):
        # every level's wall time + spill, every adjacent-pair efficiency,
        # the no-Ray hardware control, and the level-choice rationale land
        # in the one JSON line the driver records.
        n_turns = int(os.environ.get("BENCH_SCALING_TURNS", "1920000"))
        levels = [
            int(x)
            for x in os.environ.get("BENCH_SCALING_CPUS", "2,8,32").split(",")
            if x.strip()
        ]
        if len(levels) < 2:
            raise SystemExit(
                "BENCH_SCALING_CPUS needs at least two comma-separated "
                f"levels to form a scaling pair (got {levels!r}); failing "
                "fast BEFORE the minutes-long child runs."
            )
        from spacy_llm_ray.data import ensure_dataset

        scaling_dir = ensure_dataset(n_turns)
        results = {n: run_child(n, scaling_dir) for n in levels}
        # LIVE hardware control at the primary pair's worker counts
        # (r4 VERDICT #3: embedded control numbers must be measured at
        # HEAD on this box — is_live_measurement: true). Skippable via
        # BENCH_SCALING_SKIP_CONTROL=1 for quick iteration, in which case
        # the artifact says so instead of shipping stale constants.
        control: dict = {"is_live_measurement": False,
                         "skipped": "BENCH_SCALING_SKIP_CONTROL=1"}
        if not os.environ.get("BENCH_SCALING_SKIP_CONTROL"):
            c_lo = run_control(levels[0], n_turns)
            c_hi = run_control(levels[1], n_turns)
            c_eff = (c_lo["value"] / c_hi["value"]) / (levels[1] / levels[0])
            control = {
                "source": "scripts/scaling_control.py — no-Ray "
                "multiprocessing running the identical fused kernel, "
                "pure compute in the timed section; run live by this "
                "--scaling invocation at the primary pair's levels",
                "is_live_measurement": True,
                "turns": n_turns,
                "workers_sec": {
                    str(levels[0]): c_lo["value"],
                    str(levels[1]): c_hi["value"],
                },
                "efficiency": {
                    f"{levels[0]}->{levels[1]}": round(c_eff, 3)
                },
            }
        pairs = []
        for lo, hi in zip(levels, levels[1:]):
            eff = (results[lo]["value"] / results[hi]["value"]) / (hi / lo)
            pairs.append(
                {"lo": lo, "hi": hi, "scaling_efficiency": round(eff, 3)}
            )
        lo, hi = levels[0], levels[1]
        primary_eff = pairs[0]["scaling_efficiency"]
        print(
            json.dumps(
                {
                    "metric": "kg_pipeline_scaling",
                    "unit": "sec",
                    "sf": results[lo]["sf"],
                    "turns": results[lo].get("turns"),
                    # Back-compat primary-pair fields:
                    "cpus_lo": lo,
                    "cpus_hi": hi,
                    f"sec_{lo}": results[lo]["value"],
                    f"sec_{hi}": results[hi]["value"],
                    f"turns_per_sec_{lo}": results[lo]["turns_per_sec"],
                    f"turns_per_sec_{hi}": results[hi]["turns_per_sec"],
                    "scaling_efficiency": primary_eff,
                    # Full artifact:
                    "levels": {
                        str(n): {
                            "sec": results[n]["value"],
                            "turns_per_sec": results[n]["turns_per_sec"],
                            "object_store_spilled_mb": results[n].get(
                                "object_store_spilled_mb"
                            ),
                        }
                        for n in levels
                    },
                    "pairs": pairs,
                    "primary_pair": f"{lo}->{hi}",
                    "hardware_control": control,
                    "level_choice": (
                        "2->8 is the primary pair because both levels sit "
                        "below this single box's DRAM-bandwidth saturation "
                        "(~12-16 string-processing workers with the "
                        "vectorized kernel; the live hardware_control above "
                        "measures the no-Ray ceiling at the same levels), "
                        "so higher pairs measure the box, not the engine. "
                        "The 8->32 pair is reported anyway. Multi-node "
                        "clusters do not share DRAM — each node brings its "
                        "own bandwidth."
                    ),
                }
            )
        )
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
