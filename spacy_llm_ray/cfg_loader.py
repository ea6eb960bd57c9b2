"""spaCy / confection ``.cfg`` compatibility loader.

A spacy-llm user's existing config files (the reference's
``usage_examples/*/*.cfg``, parsed by confection — util.py:22-48 in the
reference) load directly: the INI-with-dotted-sections format is parsed into
a nested dict, ``${section.key}`` variables interpolate, and ``@llm_tasks`` /
``@llm_models`` / ``@misc`` / ``@llm_misc`` registry references resolve
against THIS engine's registries (the registered names already line up —
``registry.py`` / ``models/registry.py``).

confection itself is not installed in this container, so the subset of its
syntax the reference's configs use is parsed here: JSON-typed values, bare
strings, indented multi-line continuations, nested sections, variable
interpolation, and null/true/false literals.

``build_pipeline(cfg)`` returns the ordered LLM stage objects ready for
``map_batches`` — sourced spaCy components (e.g. ``source =
"en_core_web_md"``) are noted but skipped, as the engine replaces them with
its own stages.
"""

from __future__ import annotations

import configparser
import json
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

_VAR_RE = re.compile(r"\$\{([A-Za-z0-9_.]+)\}")


def _parse_value(raw: str) -> Any:
    """confection value semantics: JSON first, then bare string (quotes
    stripped); multi-line continuations are joined with newlines."""
    s = raw.strip()
    if s == "" or s.lower() == "null":
        return None
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        pass
    if len(s) >= 2 and s[0] == s[-1] == '"':
        return s[1:-1]
    # configparser joins continuation lines with '\n'; confection treats the
    # whole thing as one string value.
    return s


def parse_cfg(text: str, interpolate: bool = True) -> Dict[str, Any]:
    """Parse .cfg text into a nested dict (sections split on '.')."""
    cp = configparser.ConfigParser(interpolation=None, strict=False)
    cp.optionxform = str  # preserve key case (labels, @keys)
    cp.read_string(text)
    root: Dict[str, Any] = {}
    for section in cp.sections():
        node = root
        for part in section.split("."):
            node = node.setdefault(part, {})
        for key, raw in cp.items(section):
            node[key] = _parse_value(raw)
    if interpolate:
        _interpolate(root, root)
    return root


def _lookup(root: Dict[str, Any], dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            raise KeyError(f"unresolved config variable ${{{dotted}}}")
        node = node[part]
    return node


def _interpolate(node: Any, root: Dict[str, Any]):
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, str):
                m = _VAR_RE.fullmatch(v.strip())
                if m:
                    node[k] = _lookup(root, m.group(1))
                else:
                    node[k] = _VAR_RE.sub(
                        lambda mm: str(_lookup(root, mm.group(1))), v
                    )
            else:
                _interpolate(v, root)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            if isinstance(v, str):
                m = _VAR_RE.fullmatch(v.strip())
                if m:
                    node[i] = _lookup(root, m.group(1))
                else:
                    node[i] = _VAR_RE.sub(
                        lambda mm: str(_lookup(root, mm.group(1))), v
                    )
            else:
                _interpolate(v, root)


def load_cfg(source: Union[str, Path], overrides: Optional[Dict[str, Any]] = None
             ) -> Dict[str, Any]:
    """Load a .cfg file (or raw text) into the nested dict form.
    ``overrides`` maps dotted paths (e.g. ``"paths.examples"``) to values,
    like spaCy's ``--paths.examples`` CLI overrides."""
    # A Path (or an existing file path) is read from disk; anything else is
    # treated as raw cfg text — a single-line raw string must not be
    # misrouted to the filesystem (it would FileNotFoundError or, worse,
    # read an unintended file that happens to exist).
    if isinstance(source, Path):
        text = source.read_text()
    elif "\n" not in str(source) and os.path.exists(str(source)):
        text = Path(source).read_text()
    elif (
        "\n" not in str(source)
        and not str(source).lstrip().startswith("[")
        and (str(source).endswith(".cfg") or os.sep in str(source))
    ):
        # Single-line string that LOOKS like a path but doesn't exist: a
        # clear FileNotFoundError beats configparser's MissingSectionHeader
        # from parsing the path string as cfg text. A string OPENING with a
        # '[' section header is raw cfg text (possibly one line whose value
        # contains a '/', e.g. a paths entry) and must route to the parser
        # — but a '[' elsewhere (a path like 'configs/[dev]/x.cfg') is
        # still a missing path worth reporting by name.
        raise FileNotFoundError(f"config file not found: {source}")
    else:
        text = str(source)
    # Overrides land BEFORE interpolation so ${paths.x} picks them up.
    cfg = parse_cfg(text, interpolate=False)
    for dotted, value in (overrides or {}).items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    _interpolate(cfg, cfg)
    return cfg


def _registry_ref(section: Dict[str, Any]) -> Optional[Tuple[str, str, Dict]]:
    """If the section is a registry reference, return (registry, name,
    kwargs) where kwargs includes resolved subsections."""
    for key in ("@llm_tasks", "@llm_models", "@llm_misc", "@misc"):
        if key in section:
            kwargs = {
                k: v for k, v in section.items() if not k.startswith("@")
            }
            return key, section[key], kwargs
    return None


def _resolve_misc(name: str, kwargs: Dict[str, Any]) -> Any:
    """@misc / @llm_misc resolution for the readers/loaders the reference's
    configs use."""
    from . import kb as kbmod
    from . import readers

    if name == "spacy.FewShotReader.v1":
        path = kwargs.get("path")
        return readers.fewshot_reader(path) if path else None
    if name == "spacy.FileReader.v1":
        path = kwargs.get("path")
        return readers.file_reader(path) if path else None
    if name == "spacy.KBFileLoader.v1":
        path = kwargs.get("path")
        return kbmod.kb_from_yaml(path) if path else None
    if name == "spacy.CandidateSelector.v1":
        # The engine folds candidate selection into ElStage (top-n by prior);
        # resolve the inner kb_loader and pass the KB through.
        loader = kwargs.get("kb_loader")
        return loader
    raise ValueError(f"unsupported @misc reference {name!r} in .cfg")


def _resolve_section(section: Any) -> Any:
    """Depth-first resolution: registry references at any nesting level are
    replaced by their built objects."""
    if not isinstance(section, dict):
        return section
    resolved = {k: _resolve_section(v) for k, v in section.items()}
    ref = _registry_ref(resolved)
    if ref is None:
        return resolved
    reg, name, kwargs = ref
    if reg in ("@misc", "@llm_misc"):
        return _resolve_misc(name, kwargs)
    if reg == "@llm_models":
        from .models.registry import make_model

        return make_model(name, **kwargs)
    # @llm_tasks handled by the component builder (needs the model).
    return resolved


def build_pipeline(source: Union[str, Path, Dict[str, Any]],
                   overrides: Optional[Dict[str, Any]] = None,
                   models: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Build the LLM components described by a spacy-llm .cfg.

    ``source`` may also be an already-parsed nested config dict (the
    serde path: AssembledPipeline.from_bytes rebuilds from the embedded
    config). Returns ``{"components": {name: stage}, "order": [...],
    "skipped": [...], "config": nested_cfg}``. ``models`` optionally
    overrides the built model per component name (e.g. to inject a
    mock/transport-wired model for offline runs)."""
    from .normalizers import split_labels
    from .registry import make_task

    cfg = source if isinstance(source, dict) else load_cfg(source, overrides)
    pipeline_order = (cfg.get("nlp") or {}).get("pipeline") or []
    components_cfg = cfg.get("components") or {}
    init_cfg = (cfg.get("initialize") or {}).get("components") or {}

    built: Dict[str, Any] = {}
    skipped: List[str] = []
    for comp_name in pipeline_order or components_cfg.keys():
        comp = components_cfg.get(comp_name)
        if not isinstance(comp, dict) or comp.get("factory") != "llm":
            skipped.append(comp_name)
            continue
        task_section = comp.get("task") or {}
        ref = _registry_ref(task_section)
        if ref is None:
            raise ValueError(f"component {comp_name!r} has no @llm_tasks task")
        _, task_name, _ = ref

        task_kwargs = {
            k: _resolve_section(v)
            for k, v in task_section.items()
            if not k.startswith("@")
        }
        if isinstance(task_kwargs.get("labels"), str):
            task_kwargs["labels"] = split_labels(task_kwargs["labels"])
        # confection keys the engine stages don't take verbatim:
        task_kwargs.pop("save_io", None)

        if models and comp_name in models:
            model = models[comp_name]
        else:
            model_section = comp.get("model") or {}
            model = _resolve_section(model_section)
            if isinstance(model, dict):
                raise ValueError(
                    f"component {comp_name!r} has no @llm_models model"
                )

        # EL candidate selector / KB from [initialize.components.<name>].
        init_comp = init_cfg.get(comp_name) or {}
        if "candidate_selector" in init_comp:
            cs_raw = init_comp["candidate_selector"]
            if isinstance(cs_raw, dict) and "top_n" in cs_raw:
                # spacy.CandidateSelector.v1(top_n=...) -> ElStage top_n.
                task_kwargs.setdefault("top_n", cs_raw["top_n"])
            kb = _resolve_section(cs_raw)
            if kb is not None:
                task_kwargs.setdefault("kb", kb)

        built[comp_name] = make_task(task_name, model=model, **task_kwargs)

    # Plan-time schema-chain validation (reference ty.py:344-449 analog):
    # e.g. a REL/EL component ordered before any mentions-producing stage
    # fails HERE, not mid-run. Non-LLM (skipped) components are assumed to
    # provide mentions if named like a NER source, matching spaCy pipelines
    # that source a statistical NER before the LLM stage.
    from .stages.schemas import validate_chain

    input_columns = {"doc_id", "conv_id", "text"}
    if any("ner" in s.lower() for s in skipped):
        input_columns.add("mentions")
    validate_chain(
        [built[n] for n in (pipeline_order or built) if n in built],
        input_columns,
    )

    return {
        "components": built,
        "order": [n for n in (pipeline_order or built)],
        "skipped": skipped,
        "config": cfg,
    }


class AssembledPipeline:
    """Runnable analog of the reference's assembled ``nlp`` object
    (util.py:37-48): ordered LLM stages applied as chained ``map_batches``
    over a Dataset. Accepts a ``ray.data.Dataset``, a ``pyarrow.Table`` or
    a list of texts."""

    def __init__(self, components: Dict[str, Any], order, skipped, config):
        self.components = components
        self.order = [n for n in order if n in components]
        self.skipped = skipped
        self.config = config

    def __call__(self, data, batch_size: int = 64):
        import pyarrow as pa_
        import ray.data

        if isinstance(data, list):
            data = ray.data.from_arrow(
                pa_.table({"doc_id": list(range(len(data))), "text": data})
            )
        elif isinstance(data, pa_.Table):
            data = ray.data.from_arrow(data)
        ds = data
        for name in self.order:
            # Stage objects are already-constructed callables, so they run
            # as task-pool UDFs here; for actor-pool residency (model
            # weights), call map_batches with the stage CLASS +
            # fn_constructor_kwargs directly, as the engine pipelines do.
            ds = ds.map_batches(
                self.components[name],
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return ds

    # -- byte / disk serde ------------------------------------------------
    # Mirrors the reference's BuiltinTask.to_bytes/from_bytes contract
    # (/root/reference/spacy_llm/tasks/builtin_task.py:175-255): two
    # sections, "cfg" (the full resolved config) and "prompt_examples"
    # (per-component example dicts, which take precedence over
    # config-initialized examples on load — the reference's semantics).
    # The reference's envelope is srsly msgpack (spacy util.to_bytes);
    # srsly isn't installed here, so the envelope is a deterministic,
    # version-tagged JSON+base64 blob. Models are NOT serialized (same as
    # the reference — they're config-built); pass ``models=`` on load to
    # inject offline/mocked model objects.

    _SERDE_VERSION = 1

    def to_bytes(self, *, exclude: tuple = ()) -> bytes:
        import base64

        sections: Dict[str, bytes] = {}
        if "cfg" not in exclude:
            sections["cfg"] = json.dumps(
                self.config, sort_keys=True, default=str
            ).encode()
        if "prompt_examples" not in exclude:
            from .tasks.examples import examples_to_dicts

            examples = {
                name: examples_to_dicts(getattr(comp, "_examples", None))
                for name, comp in self.components.items()
            }
            sections["prompt_examples"] = json.dumps(
                examples, sort_keys=True, default=str
            ).encode()
        payload = {
            "__version__": self._SERDE_VERSION,
            "sections": {
                k: base64.b64encode(v).decode() for k, v in sections.items()
            },
        }
        return json.dumps(payload, sort_keys=True).encode()

    @classmethod
    def from_bytes(
        cls,
        data: bytes,
        *,
        models: Optional[Dict[str, Any]] = None,
        exclude: tuple = (),
    ) -> "AssembledPipeline":
        import base64

        payload = json.loads(data.decode())
        version = payload.get("__version__")
        if version != cls._SERDE_VERSION:
            raise ValueError(
                f"unsupported AssembledPipeline serde version {version!r}"
            )
        sections = {
            k: base64.b64decode(v) for k, v in payload["sections"].items()
        }
        if "cfg" not in sections:
            raise ValueError("serialized pipeline has no 'cfg' section")
        cfg = json.loads(sections["cfg"].decode())
        built = build_pipeline(cfg, models=models)
        pipe = cls(
            built["components"], built["order"], built["skipped"], built["config"]
        )
        if "prompt_examples" in sections and "prompt_examples" not in exclude:
            for name, examples in json.loads(
                sections["prompt_examples"].decode()
            ).items():
                comp = pipe.components.get(name)
                if comp is None or examples is None:
                    continue
                if hasattr(comp, "set_examples"):
                    comp.set_examples(examples)
                else:
                    comp._examples = list(examples)
        return pipe

    def to_disk(self, path: Union[str, Path], *, exclude: tuple = ()) -> None:
        """Section-per-file directory layout (the reference writes cfg +
        prompt_examples files via spacy's util.to_disk)."""
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        (p / "pipeline.bytes").write_bytes(self.to_bytes(exclude=exclude))

    @classmethod
    def from_disk(
        cls,
        path: Union[str, Path],
        *,
        models: Optional[Dict[str, Any]] = None,
        exclude: tuple = (),
    ) -> "AssembledPipeline":
        return cls.from_bytes(
            (Path(path) / "pipeline.bytes").read_bytes(),
            models=models,
            exclude=exclude,
        )


def assemble(config_path: Union[str, Path], *,
             overrides: Optional[Dict[str, Any]] = None,
             models: Optional[Dict[str, Any]] = None) -> AssembledPipeline:
    """Assemble a runnable pipeline from a spacy-llm .cfg file — the
    reference's ``spacy_llm.assemble`` (util.py:37-48) re-expressed over Ray
    Data. ``overrides`` maps dotted config paths (the reference's CLI
    overrides); ``models`` injects model objects per component (e.g. a mock
    or a transport-wired provider for offline runs)."""
    built = build_pipeline(config_path, overrides=overrides, models=models)
    return AssembledPipeline(
        built["components"], built["order"], built["skipped"], built["config"]
    )
