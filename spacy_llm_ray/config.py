"""Config-driven pipeline assembly.

The reference's primary entry point is ``spacy_llm.util.assemble(config)``
(/root/reference/spacy_llm/util.py:22-48): a declarative config resolves
registered task/model factories into a runnable pipeline. The engine analog:
a YAML/JSON job config resolves model-registry names + stage options into a
composed Ray Data plan; validation happens at build time (unknown model or
task names, missing labels fail before any cluster work starts — the analog
of the reference's ``validate_type_consistency``, ty.py:344-449).

Example job config::

    input: /root/testdata/sf0.001
    output: /tmp/kg_out
    pipeline: kg
    models:
      ner: {name: mock.NER.v1, context_length: 4097}
      rel: {name: mock.REL.v1, context_length: 4097}
      el:  {name: mock.EL.v1}
    labels:
      ner: [PERSON, GPE, ORG]
      rel: [LivesIn, Visits, WorksIn]
    checkpoint:
      n_partitions: 8
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

from .models.registry import make_model, model_names

VALID_PIPELINES = ("kg", "mentions", "documents")


def load_config(source: Union[str, Path, Dict]) -> Dict[str, Any]:
    if isinstance(source, dict):
        return dict(source)
    path = Path(source)
    text = path.read_text()
    if path.suffix in (".yml", ".yaml"):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


def validate_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Fail-fast plan validation (build-time type/consistency checks)."""
    if "input" not in cfg:
        raise ValueError("config needs an 'input' (transcripts sf dir)")
    pipeline = cfg.get("pipeline", "kg")
    if pipeline not in VALID_PIPELINES:
        raise ValueError(f"unknown pipeline {pipeline!r}; expected one of {VALID_PIPELINES}")
    for role, spec in (cfg.get("models") or {}).items():
        name = spec.get("name")
        if name not in model_names():
            raise ValueError(
                f"unknown model {name!r} for role {role!r}; known: {model_names()}"
            )
    ckpt = cfg.get("checkpoint") or {}
    if ckpt and not cfg.get("output"):
        raise ValueError("checkpointed jobs need an 'output' directory")
    if ckpt and int(ckpt.get("n_partitions", 8)) < 1:
        raise ValueError("checkpoint.n_partitions must be >= 1")
    return cfg


def build_models(cfg: Dict[str, Any]) -> Dict[str, Any]:
    from .pipelines import kg as kgmod

    specs = cfg.get("models") or {}
    if not specs:
        return kgmod.default_models()
    models = {}
    for role, spec in specs.items():
        spec = dict(spec)
        name = spec.pop("name")
        # 'name' is the REGISTERED name (spacy.GPT-4.v3); 'model_name'
        # optionally selects the provider-side model id within the family
        # (e.g. gpt-4-32k), forwarded as the factory's own name= kwarg.
        if "model_name" in spec:
            spec["name"] = spec.pop("model_name")
        models[role] = make_model(name, **spec)
    return models


def run_job(source: Union[str, Path, Dict]) -> Dict[str, Any]:
    """Build and run a configured job. Assumes Ray is already initialised by
    the caller (driver contract); ``spacy_llm_ray.run`` owns a session for
    standalone CLI use."""
    cfg = validate_config(load_config(source))
    models = build_models(cfg)
    pipeline = cfg.get("pipeline", "kg")
    sf_dir = cfg["input"]
    out = cfg.get("output")

    from .pipelines import kg as kgmod

    ckpt = cfg.get("checkpoint") or {}
    if pipeline == "kg" and ckpt:
        from .state.checkpoint import run_partitioned_kg

        summary = run_partitioned_kg(
            sf_dir,
            out,
            n_partitions=int(ckpt.get("n_partitions", 8)),
            n_shards_per_partition=int(ckpt.get("n_shards_per_partition", 1)),
            unit_parallelism=int(ckpt.get("unit_parallelism", 1)),
            models=models,
            batch_size=int(cfg.get("batch_size", 64)),
        )
        return {"pipeline": "kg", "checkpointed": True, **summary}

    if pipeline == "kg":
        ds = kgmod.kg_triples_dataset(sf_dir, models=models,
                                      batch_size=int(cfg.get("batch_size", 64)))
    elif pipeline == "mentions":
        ds = kgmod.kg_mentions_dataset(sf_dir, models=models)
    else:  # documents
        ds = kgmod.documents_dataset(sf_dir)

    if out:
        ds.write_parquet(out)
        n = None
    else:
        n = ds.count()
    return {"pipeline": pipeline, "checkpointed": False, "output": out, "rows": n}
