"""Deterministic synthetic multi-turn transcripts + KB + gold triples.

The driver input hint (BASELINE.json) mandates the table shape
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``; no such table exists in /root/testdata, so we synthesize
it deterministically (seeded, byte-stable across runs) at a scale matched to
the requested scale factor. Sentences follow a closed grammar
``"<SUBJ> <pred phrase> <OBJ>."`` over a fixed gazetteer (modeled on the
reference fixtures, e.g. "Laura bought a house in Boston with her husband
Mark" -> (Laura, LivesIn, Boston), tests/tasks/examples/rel.jsonl:1-2), so the
planted facts are recoverable both by the mock-LLM pipeline and by a DuckDB
regex oracle — the driver's correctness gate compares the two.

Properties the mock/oracle pair relies on:
- gazetteer surfaces contain no trailing punctuation (regex \\b-safe), and the
  only substring collisions are the explicit alias variants (longest-first
  alternation resolves them identically in Python `re` and DuckDB RE2),
- filler sentences contain no gazetteer surface and no predicate phrase,
- facts never span turn boundaries (turns are joined with \\n when documents
  are assembled),
- Zipf-skewed conversation lengths (one giant conversation per dataset)
  exercise the salted document-assembly shuffle,
- rows are written in a seeded shuffled order to force the (conv_id, turn_idx)
  sort.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_DATA_DIR = "/tmp/spacy_llm_ray_data"
SEED = 42

# ---------------------------------------------------------------- gazetteer

PERSONS_KB = [
    "Alice Johnson", "Bob Stone", "Carol Mendez", "David Okafor",
    "Emma Larsen", "Frank Horvat", "Grace Liu", "Henry Abara",
]
PERSONS_NIL = [  # present in text, absent from the KB -> auto-NIL path
    "Irene Fontaine", "Jack Morrow", "Nina Petrova", "Oscar Vidal",
]
CITIES = [
    "Boston", "Paris", "Berlin", "Madrid", "Lisbon", "Oslo",
    "Toronto", "Chicago", "Springfield", "Geneva",
    "New York", "New York City",  # alias variants of the same entity
]
ORGS = [
    "Acme Corp", "Acme Corporation",  # alias variants of the same entity
    "Globex", "Globex Inc",           # alias variants of the same entity
    "Initech", "Hooli", "Vandelay Industries", "Pied Piper",
]

GAZETTEER: Dict[str, str] = {
    **{p: "PERSON" for p in PERSONS_KB + PERSONS_NIL},
    **{c: "GPE" for c in CITIES},
    **{o: "ORG" for o in ORGS},
}

PREDICATES: Dict[str, str] = {
    "lives in": "LivesIn",
    "visits": "Visits",
    "works in": "WorksIn",
}
# predicate phrase -> (subject label, object pool name)
_PRED_OBJECTS = {"lives in": CITIES, "visits": CITIES, "works in": ORGS}

FILLERS = [
    "Thanks for the update.",
    "Let me check the logs again.",
    "That sounds reasonable to me.",
    "Please run the numbers one more time.",
    "The deployment finished without errors.",
    "I will follow up tomorrow morning.",
    "Could you clarify the last point?",
    "The tests are green on my side.",
]

# ---------------------------------------------------------------- KB spec

KB_ENTITIES: Dict[str, Dict[str, str]] = {
    # persons
    "Q1": {"name": "Alice Johnson", "desc": "software engineer"},
    "Q2": {"name": "Bob Stone", "desc": "data analyst"},
    "Q3": {"name": "Carol Mendez", "desc": "product manager"},
    "Q4": {"name": "David Okafor", "desc": "researcher"},
    "Q5": {"name": "Emma Larsen", "desc": "designer"},
    "Q6": {"name": "Frank Horvat", "desc": "photographer"},
    "Q7": {"name": "Grace Liu", "desc": "economist"},
    "Q8": {"name": "Henry Abara", "desc": "teacher"},
    # cities
    "Q100": {"name": "Boston", "desc": "city in Massachusetts"},
    "Q90": {"name": "Paris", "desc": "capital of France"},
    "Q64": {"name": "Berlin", "desc": "capital of Germany"},
    "Q2807": {"name": "Madrid", "desc": "capital of Spain"},
    "Q597": {"name": "Lisbon", "desc": "capital of Portugal"},
    "Q585": {"name": "Oslo", "desc": "capital of Norway"},
    "Q172": {"name": "Toronto", "desc": "city in Canada"},
    "Q1297": {"name": "Chicago", "desc": "city in Illinois"},
    "Q28515": {"name": "Springfield", "desc": "city in Illinois"},
    "Q49112": {"name": "Springfield MA", "desc": "city in Massachusetts"},
    "Q71": {"name": "Geneva", "desc": "city in Switzerland"},
    "Q60": {"name": "New York City", "desc": "most populous city in the United States"},
    # orgs
    "Q500": {"name": "Acme Corporation", "desc": "fictional manufacturer"},
    "Q501": {"name": "Globex", "desc": "fictional conglomerate"},
    "Q502": {"name": "Initech", "desc": "fictional software company"},
    "Q503": {"name": "Hooli", "desc": "fictional tech giant"},
    "Q504": {"name": "Vandelay Industries", "desc": "fictional import/export company"},
    "Q505": {"name": "Pied Piper", "desc": "fictional startup"},
}

KB_ALIASES: List[Dict] = [
    {"alias": "Alice Johnson", "entities": ["Q1"], "probabilities": [0.9]},
    {"alias": "Bob Stone", "entities": ["Q2"], "probabilities": [0.9]},
    {"alias": "Carol Mendez", "entities": ["Q3"], "probabilities": [0.9]},
    {"alias": "David Okafor", "entities": ["Q4"], "probabilities": [0.9]},
    {"alias": "Emma Larsen", "entities": ["Q5"], "probabilities": [0.9]},
    {"alias": "Frank Horvat", "entities": ["Q6"], "probabilities": [0.9]},
    {"alias": "Grace Liu", "entities": ["Q7"], "probabilities": [0.9]},
    {"alias": "Henry Abara", "entities": ["Q8"], "probabilities": [0.9]},
    {"alias": "Boston", "entities": ["Q100"], "probabilities": [0.8]},
    {"alias": "Paris", "entities": ["Q90"], "probabilities": [0.8]},
    {"alias": "Berlin", "entities": ["Q64"], "probabilities": [0.8]},
    {"alias": "Madrid", "entities": ["Q2807"], "probabilities": [0.8]},
    {"alias": "Lisbon", "entities": ["Q597"], "probabilities": [0.8]},
    {"alias": "Oslo", "entities": ["Q585"], "probabilities": [0.8]},
    {"alias": "Toronto", "entities": ["Q172"], "probabilities": [0.8]},
    {"alias": "Chicago", "entities": ["Q1297"], "probabilities": [0.8]},
    # Ambiguous alias: two candidates; the top-prior one wins deterministically.
    {"alias": "Springfield", "entities": ["Q28515", "Q49112"], "probabilities": [0.6, 0.3]},
    {"alias": "Geneva", "entities": ["Q71"], "probabilities": [0.8]},
    # Alias variants of one entity (canonicalization merges them):
    {"alias": "New York", "entities": ["Q60"], "probabilities": [0.7]},
    {"alias": "New York City", "entities": ["Q60"], "probabilities": [0.9]},
    {"alias": "Acme Corp", "entities": ["Q500"], "probabilities": [0.7]},
    {"alias": "Acme Corporation", "entities": ["Q500"], "probabilities": [0.9]},
    {"alias": "Globex", "entities": ["Q501"], "probabilities": [0.9]},
    {"alias": "Globex Inc", "entities": ["Q501"], "probabilities": [0.7]},
    {"alias": "Initech", "entities": ["Q502"], "probabilities": [0.9]},
    {"alias": "Hooli", "entities": ["Q503"], "probabilities": [0.9]},
    {"alias": "Vandelay Industries", "entities": ["Q504"], "probabilities": [0.9]},
    {"alias": "Pied Piper", "entities": ["Q505"], "probabilities": [0.9]},
]


def build_kb():
    from ..kb import kb_from_dicts

    return kb_from_dicts(KB_ENTITIES, KB_ALIASES)


def canonical_map() -> Dict[str, Tuple[str, str]]:
    """surface -> (canonical id, canonical name).

    Mirrors what the pipeline's canonicalization computes on this dataset:
    linked surfaces (link = top-prior candidate of the alias, which is what
    the deterministic EL model picks) canonicalize to their KB entity's name;
    unlinked surfaces get qid "NIL" and canonicalize to themselves.
    """
    out: Dict[str, Tuple[str, str]] = {}
    for alias_data in KB_ALIASES:
        pairs = sorted(
            zip(alias_data["entities"], alias_data["probabilities"]),
            key=lambda ep: ep[1],
            reverse=True,
        )
        qid = pairs[0][0]
        out[alias_data["alias"]] = (qid, KB_ENTITIES[qid]["name"])
    for surface in GAZETTEER:
        if surface not in out:
            out[surface] = ("NIL", surface)
    return out


# ---------------------------------------------------------------- generator

_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

SF_TURNS = {"sf0.001": 600, "sf0.01": 6000, "sf0.1": 60000}


def _conv_lengths(n_turns: int, rng: random.Random) -> List[int]:
    """Zipf-ish skew: conversation i gets ~ 1/(i+1)^0.9 of the mass; the head
    conversation is orders of magnitude longer than the tail."""
    n_convs = max(4, n_turns // 12)
    weights = np.arange(1, n_convs + 1, dtype=np.float64) ** -0.9
    weights /= weights.sum()
    lengths = np.maximum(1, np.floor(weights * n_turns)).astype(int)
    # Fix rounding drift onto the head conversation.
    lengths[0] += n_turns - int(lengths.sum())
    return lengths.tolist()


def _make_sentence(rng: random.Random) -> str:
    if rng.random() < 0.45:
        pred = rng.choice(sorted(PREDICATES))
        subj = rng.choice(PERSONS_KB + PERSONS_NIL)
        obj = rng.choice(_PRED_OBJECTS[pred])
        return f"{subj} {pred} {obj}."
    return rng.choice(FILLERS)


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    rng = random.Random(seed)
    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    tss: List[int] = []

    base_ts = 1_700_000_000_000_000  # fixed epoch micros; no wall-clock use
    role_cycle = ["user", "assistant", "tool"]
    for ci, length in enumerate(_conv_lengths(n_turns, rng)):
        conv = f"conv-{ci:06d}"
        for ti in range(length):
            n_sents = rng.randint(1, 3)
            text = " ".join(_make_sentence(rng) for _ in range(n_sents))
            role = role_cycle[ti % 3] if rng.random() < 0.9 else "user"
            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append("search" if role == "tool" else "")
            tss.append(base_ts + ci * 3_600_000_000 + ti * 1_000_000)

    # Shuffle row order (seeded) so consumers must sort by (conv_id, turn_idx).
    order = list(range(len(conv_ids)))
    rng.shuffle(order)
    take = lambda xs: [xs[i] for i in order]  # noqa: E731
    return pa.table(
        {
            "conv_id": take(conv_ids),
            "turn_idx": pa.array(take(turn_idxs), type=pa.int32()),
            "role": take(roles),
            "text": take(texts),
            "tool": take(tools),
            "ts": pa.array(take(tss), type=pa.timestamp("us")),
        },
        schema=_SCHEMA,
    )


def _gold_triples(transcripts: pa.Table) -> pa.Table:
    """Recover the planted facts per conversation (generator-side gold)."""
    import re

    cmap = canonical_map()
    subj_alt = "|".join(
        re.escape(s) for s in sorted(PERSONS_KB + PERSONS_NIL, key=len, reverse=True)
    )
    objs = sorted(set(CITIES + ORGS), key=len, reverse=True)
    obj_alt = "|".join(re.escape(s) for s in objs)
    pred_alt = "|".join(re.escape(p) for p in sorted(PREDICATES, key=len, reverse=True))
    pat = re.compile(f"({subj_alt}) ({pred_alt}) ({obj_alt})\\.")
    rows = {"conv_id": [], "subj": [], "pred": [], "obj": [],
            "subj_qid": [], "obj_qid": [], "subj_canon": [], "obj_canon": []}
    seen = set()
    for conv, text in zip(
        transcripts["conv_id"].to_pylist(), transcripts["text"].to_pylist()
    ):
        for m in pat.finditer(text):
            subj, pred, obj = m.group(1), m.group(2), m.group(3)
            key = (conv, subj, pred, obj)
            if key in seen:
                continue
            seen.add(key)
            sq, sc = cmap[subj]
            oq, oc = cmap[obj]
            rows["conv_id"].append(conv)
            rows["subj"].append(subj)
            rows["pred"].append(PREDICATES[pred])
            rows["obj"].append(obj)
            rows["subj_qid"].append(sq)
            rows["obj_qid"].append(oq)
            rows["subj_canon"].append(sc)
            rows["obj_canon"].append(oc)
    return pa.table(rows)


def transcripts_path(sf_name: str, base_dir: str = DEFAULT_DATA_DIR) -> str:
    return os.path.join(base_dir, sf_name, "transcripts.parquet")


def ensure_dataset(
    sf: str | int, base_dir: str = DEFAULT_DATA_DIR, seed: int = SEED
) -> str:
    """Generate (once) and return the dataset dir for a scale factor.

    ``sf`` is an sf-name ("sf0.01", or a testdata dir path whose basename is
    one) or an explicit turn count. Writes transcripts.parquet,
    gold_triples.parquet, kb_entities.parquet, kb_aliases.parquet.
    """
    if isinstance(sf, int):
        sf_name, n_turns = f"turns{sf}", sf
    elif os.path.exists(os.path.join(str(sf), "_COMPLETE")):
        # A ready-made generated dataset dir (any path): use it in place.
        with open(os.path.join(str(sf), "_COMPLETE")) as f:
            if "format=v2" in f.read():
                return str(sf)
        # Stale/pre-v2 marker: a dir whose basename names a known scale
        # factor is one of ours — fall through to the name-based flow,
        # which rmtree's and regenerates it (the pre-existing behavior).
        # Only a NON-resolvable custom dir is an error.
        base = os.path.basename(str(sf).rstrip("/"))
        if base not in SF_TURNS and not (
            base.startswith("turns") and base[5:].isdigit()
        ):
            raise ValueError(
                f"dataset dir {sf!r} has an incompatible format marker"
            )
        sf_name = base
        n_turns = SF_TURNS.get(base) or int(base[5:])
    else:
        sf_name = os.path.basename(str(sf).rstrip("/"))
        if sf_name in SF_TURNS:
            n_turns = SF_TURNS[sf_name]
        elif sf_name.startswith("turns") and sf_name[5:].isdigit():
            n_turns = int(sf_name[5:])
        else:
            raise ValueError(
                f"unknown scale factor {sf!r}; expected one of {sorted(SF_TURNS)} or 'turns<N>'"
            )

    out_dir = os.path.join(base_dir, sf_name)
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if "format=v2" in f.read():
                return out_dir
        import shutil

        shutil.rmtree(out_dir)  # stale single-file layout — regenerate
    os.makedirs(out_dir, exist_ok=True)

    transcripts = generate_transcripts(n_turns, seed=seed)
    # Multiple part files so a distributed reader parallelizes the scan (a
    # single parquet file is read by one task — a serial bottleneck at scale).
    tdir = os.path.join(out_dir, "transcripts.parquet")
    os.makedirs(tdir, exist_ok=True)
    n_files = max(8, min(64, n_turns // 30000 + 1))
    rows_per = (transcripts.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = transcripts.slice(i * rows_per, rows_per)
        if part.num_rows:
            pq.write_table(part, os.path.join(tdir, f"part-{i:05d}.parquet"))
    pq.write_table(_gold_triples(transcripts), os.path.join(out_dir, "gold_triples.parquet"))
    ents = pa.table(
        {
            "qid": list(KB_ENTITIES.keys()),
            "name": [v["name"] for v in KB_ENTITIES.values()],
            "desc": [v["desc"] for v in KB_ENTITIES.values()],
        }
    )
    pq.write_table(ents, os.path.join(out_dir, "kb_entities.parquet"))
    als = pa.table(
        {
            "alias": [a["alias"] for a in KB_ALIASES for _ in a["entities"]],
            "qid": [q for a in KB_ALIASES for q in a["entities"]],
            "prior": [p for a in KB_ALIASES for p in a["probabilities"]],
        }
    )
    pq.write_table(als, os.path.join(out_dir, "kb_aliases.parquet"))
    with open(marker, "w") as f:
        f.write(f"n_turns={n_turns} seed={seed} format=v2\n")
    return out_dir
