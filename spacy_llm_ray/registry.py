"""Task / normalizer / misc registries, keyed by the reference's registered
names (/root/reference/spacy_llm/registry/util.py:4-13 creates the
registries; task names from tasks/*/registry.py; normalizers from
registry/normalizer.py; misc from tasks/util/sharding.py).

A user of the reference resolves the same names here and receives the
engine's stage constructors / callables:

    make_task("spacy.NER.v3", labels=[...], model=...)   -> NerStage instance
    get_normalizer("spacy.LowercaseNormalizer.v1")        -> callable
    get_misc("spacy.ShardMapper.v1")()                    -> shard mapper

Model names live in ``spacy_llm_ray.models.registry``.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from . import normalizers as _norm
from .tasks import sharding as _sharding

# ------------------------------------------------------------------ tasks

_TASKS: Dict[str, Callable] = {}


def register_task(name: str):
    def deco(factory):
        _TASKS[name] = factory
        return factory

    return deco


def task_names() -> List[str]:
    return sorted(_TASKS)


def make_task(name: str, **kwargs):
    if name not in _TASKS:
        raise ValueError(f"unknown task {name!r}; known: {task_names()}")
    return _TASKS[name](**kwargs)


def _ner_factory(cot: bool):
    def factory(**kwargs):
        from .stages.llm_stage import NerStage

        kwargs.setdefault("cot", cot)
        return NerStage(**kwargs)

    return factory


def _spancat_factory(cot: bool):
    def factory(**kwargs):
        from .stages.llm_stage import NerStage

        kwargs.setdefault("cot", cot)
        kwargs.setdefault("assign", "spans")
        kwargs.setdefault("allow_overlap", True)
        return NerStage(**kwargs)

    return factory


for _v, _cot in (("v1", False), ("v2", False), ("v3", True)):
    _TASKS[f"spacy.NER.{_v}"] = _ner_factory(_cot)
    _TASKS[f"spacy.SpanCat.{_v}"] = _spancat_factory(_cot)


@register_task("spacy.REL.v1")
def _rel(**kwargs):
    from .stages.llm_stage import RelStage

    return RelStage(**kwargs)


@register_task("spacy.EntityLinker.v1")
def _el(**kwargs):
    from .stages.llm_stage import ElStage

    return ElStage(**kwargs)


def _scalar_factory(prompt_mod_attr: str, parse, out_col: str, out_type=None,
                    reduce: str = "join", prompt_params: tuple = ()):
    """``prompt_params`` names factory kwargs that bind into the prompt
    builder (e.g. Translation's ``target_lang``) rather than reaching the
    stage constructor — mirroring how the reference's task factories forward
    task config into the Jinja template context."""

    def factory(model, **kwargs):
        import functools

        import pyarrow as pa

        from . import templates
        from .stages.llm_stage import LLMTaskStage

        prompt_fn = getattr(templates, prompt_mod_attr)
        bound = {p: kwargs.pop(p) for p in prompt_params if p in kwargs}
        if bound:
            prompt_fn = functools.partial(prompt_fn, **bound)
        return LLMTaskStage(
            model=model,
            prompt_fn=prompt_fn,
            parse_fn=parse,
            out_col=kwargs.pop("out_col", out_col),
            out_type=out_type or pa.string(),
            reduce=kwargs.pop("reduce", reduce),
            **kwargs,
        )

    return factory


def _register_scalar_tasks():
    import pyarrow as pa

    from .tasks.lemma import parse_lemma_response
    from .tasks.raw import parse_raw_response
    from .tasks.sentiment import parse_sentiment_response
    from .tasks.summarization import parse_summarization_response
    from .tasks.translation import parse_translation_response

    _TASKS["spacy.Sentiment.v1"] = _scalar_factory(
        "sentiment_prompt", parse_sentiment_response, "sentiment",
        pa.float64(), "weighted_mean",
    )
    _TASKS["spacy.Summarization.v1"] = _scalar_factory(
        "summarization_prompt", parse_summarization_response, "summary",
        prompt_params=("max_n_words",),
    )
    # Translation REQUIRES target_lang (reference tasks/translation/task.py);
    # bind it (and optional source_lang) into the prompt builder.
    _TASKS["spacy.Translation.v1"] = _scalar_factory(
        "translation_prompt", parse_translation_response, "translation",
        prompt_params=("target_lang", "source_lang"),
    )
    _TASKS["spacy.Raw.v1"] = _scalar_factory("raw_prompt", parse_raw_response, "reply")
    _TASKS["spacy.Lemma.v1"] = _scalar_factory(
        "lemma_prompt", parse_lemma_response, "lemma_pairs",
        pa.list_(pa.list_(pa.string())), "concat_list",
    )
    _TASKS["spacy.NoOp.v1"] = _scalar_factory("noop_prompt", parse_raw_response, "reply")
    _TASKS["spacy.NoOpNoShards.v1"] = _TASKS["spacy.NoOp.v1"]


def _textcat_factory(**kwargs):
    import pyarrow as pa

    from . import templates
    from .stages.llm_stage import LLMTaskStage
    from .tasks.textcat import TextCatConfig, parse_textcat_response

    labels = kwargs.pop("labels")
    exclusive = kwargs.pop("exclusive_classes", False)
    model = kwargs.pop("model")
    cfg = TextCatConfig(labels=labels, exclusive_classes=exclusive)

    def prompt_fn(text, i_shard=0, n_shards=1):
        return templates.textcat_prompt(
            text, labels, exclusive_classes=exclusive,
            i_shard=i_shard, n_shards=n_shards,
        )

    # Emits the full per-label score dict (Doc.cats analog).
    return LLMTaskStage(
        model=model,
        prompt_fn=prompt_fn,
        parse_fn=lambda r: parse_textcat_response(cfg, r),
        out_col=kwargs.pop("out_col", "cats"),
        out_type=pa.map_(pa.string(), pa.float64()),
        reduce="weighted_mean_cats",
        **kwargs,
    )


for _v in ("v1", "v2", "v3"):
    _TASKS[f"spacy.TextCat.{_v}"] = _textcat_factory

_register_scalar_tasks()

# llm_<task> convenience aliases for the latest task versions, mirroring the
# reference's auto-registered Language factories (tasks/__init__.py:18-42) —
# make_task("llm_ner", ...) == make_task("spacy.NER.v3", ...).
_LATEST_TASKS = (
    "spacy.EntityLinker.v1",
    "spacy.NER.v3",
    "spacy.Raw.v1",
    "spacy.REL.v1",
    "spacy.Sentiment.v1",
    "spacy.SpanCat.v3",
    "spacy.Summarization.v1",
    "spacy.TextCat.v3",
    "spacy.Translation.v1",
    "spacy.Lemma.v1",
    "spacy.NoOp.v1",
)
for _handle in _LATEST_TASKS:
    _TASKS[f"llm_{_handle.split('.')[1].lower()}"] = _TASKS[_handle]

# ------------------------------------------------- normalizers and misc

_NORMALIZERS: Dict[str, Callable[[str], str]] = {
    "spacy.StripNormalizer.v1": _norm.strip_normalizer,
    "spacy.LowercaseNormalizer.v1": _norm.lowercase_normalizer,
}

def _fewshot_reader_factory(path):
    from . import readers

    return readers.fewshot_reader(path)


def _file_reader_factory(path):
    from . import readers

    return readers.file_reader(path)


def _kb_file_loader_factory(path):
    from . import kb as kbmod

    return kbmod.kb_from_yaml(path)


def _kb_object_loader_factory(path, nlp_path=None, desc_path=None, ent_desc_reader=None):
    from . import kb as kbmod

    return kbmod.kb_from_spacy_dir(
        path, nlp_path=nlp_path, desc_path=desc_path, ent_desc_reader=ent_desc_reader
    )


_MISC: Dict[str, Callable] = {
    "spacy.NTokenEstimator.v1": lambda: _sharding.count_tokens_by_spaces,
    "spacy.ShardMapper.v1": _sharding.make_shard_mapper,
    # Reader/loader names the reference registers under @misc / @llm_misc
    # (registry/reader.py, tasks/entity_linker/registry.py).
    "spacy.FewShotReader.v1": _fewshot_reader_factory,
    "spacy.FileReader.v1": _file_reader_factory,
    "spacy.KBFileLoader.v1": _kb_file_loader_factory,
    # Import-gated on spacy (like the HF real-weights path): loads a
    # serialized spaCy InMemoryLookupKB directory.
    "spacy.KBObjectLoader.v1": _kb_object_loader_factory,
}


def get_normalizer(name: str) -> Callable[[str], str]:
    if name not in _NORMALIZERS:
        raise ValueError(f"unknown normalizer {name!r}; known: {sorted(_NORMALIZERS)}")
    return _NORMALIZERS[name]


def get_misc(name: str) -> Callable:
    if name not in _MISC:
        raise ValueError(f"unknown misc {name!r}; known: {sorted(_MISC)}")
    return _MISC[name]
