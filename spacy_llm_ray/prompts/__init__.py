"""Reference-parity prompt templates.

The ``*.jinja`` files in this directory are the reference's prompt TEXT
(/root/reference/spacy_llm/tasks/templates/*.jinja), ported verbatim per the
round-1 verdict (missing item #3 / next-step #5): a task's extraction quality
against a *real* LLM depends on the exact prompt wording its published P/R was
achieved with, so the wording is data that must match, not code to redesign.
Rendering uses ``jinja2.sandbox.SandboxedEnvironment`` with default settings,
exactly like the reference (builtin_task.py:68-69); the ``{# whitespace #}``
comment convention controls newlines.

``builder(template, **static_ctx)`` adapts a rendered template to the
engine's prompt-builder calling convention (``fn(text, i_shard, n_shards) ->
str``) so reference prompts drop into ``NerStage(prompt_builder=...)`` /
``LLMTaskStage(prompt_fn=...)`` unchanged. Deterministic mock models keep
using the engine's fenced prompts; these builders are for real-LLM backends.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Any, Callable, Dict, Optional

import jinja2
import jinja2.sandbox

TEMPLATE_DIR = Path(__file__).parent

_ENV = jinja2.sandbox.SandboxedEnvironment()
_CACHE: Dict[str, jinja2.Template] = {}


def read_template(name: str) -> str:
    """Raw template text by name (reference templates/__init__.py:6-14)."""
    path = TEMPLATE_DIR / f"{name}.jinja"
    if not path.exists():
        raise ValueError(f"{name} is not a valid template.")
    return path.read_text()


def get_template(name: str) -> jinja2.Template:
    t = _CACHE.get(name)
    if t is None:
        t = _ENV.from_string(read_template(name))
        _CACHE[name] = t
    return t


def render(name: str, **context: Any) -> str:
    """Render a named template with the given context (sandboxed, default
    whitespace semantics — byte-identical to the reference's rendering)."""
    return get_template(name).render(**context)


class PromptExample(SimpleNamespace):
    """Attribute bag for few-shot examples: templates access fields like
    ``example.text`` / ``example.spans`` / ``example.answer`` directly."""


# Template-context defaults per task family; the engine's stages pass
# ``text`` (plus sharding info, unused by the reference templates — the
# reference renders shards with the same template, builtin_task.py:71-95).
_DEFAULTS: Dict[str, Dict[str, Any]] = {
    "ner.v1": dict(labels=[], prompt_examples=None),
    "ner.v2": dict(labels=[], label_definitions=None, prompt_examples=None),
    "ner.v3": dict(labels=[], description=None, label_definitions=None,
                   prompt_examples=None),
    "spancat.v1": dict(labels=[], prompt_examples=None),
    "spancat.v2": dict(labels=[], label_definitions=None,
                       prompt_examples=None),
    "spancat.v3": dict(labels=[], description=None, label_definitions=None,
                       prompt_examples=None),
    "rel.v1": dict(labels=[], label_definitions=None, prompt_examples=None,
                   preannotate=lambda e: getattr(e, "text", "")),
    "textcat.v1": dict(labels=[], exclusive_classes=False, allow_none=True,
                       prompt_examples=None),
    "textcat.v2": dict(labels=[], exclusive_classes=False, allow_none=True,
                       prompt_examples=None),
    "textcat.v3": dict(labels=[], label_definitions=None,
                       exclusive_classes=False, allow_none=True,
                       prompt_examples=None),
    "lemma.v1": dict(prompt_examples=None),
    "sentiment.v1": dict(prompt_examples=None),
    "summarization.v1": dict(max_n_words=None, prompt_examples=None),
    "translation.v1": dict(source_lang=None, target_lang="", prompt_examples=None),
    "raw.v1": dict(prompt_examples=None),
    "entity_linker.v1": dict(prompt_examples=None, mentions_str="",
                             mentions=[], entity_descriptions=[],
                             entity_ids=[]),
}


def template_names() -> list:
    return sorted(_DEFAULTS)


def builder(name: str, **static_context: Any) -> Callable[..., str]:
    """Prompt builder over a reference template: returns
    ``fn(text, i_shard=0, n_shards=1) -> str`` with ``static_context`` bound
    (labels, definitions, few-shot examples, ...). Drop-in for the engine's
    ``prompt_builder`` / ``prompt_fn`` seams."""
    if name not in _DEFAULTS:
        raise ValueError(
            f"unknown template {name!r}; known: {template_names()}"
        )
    ctx = dict(_DEFAULTS[name])
    ctx.update(static_context)
    template = get_template(name)

    def prompt_fn(text: str, i_shard: int = 0, n_shards: int = 1) -> str:
        return template.render(text=text, **ctx)

    prompt_fn.template_name = name  # type: ignore[attr-defined]
    return prompt_fn
