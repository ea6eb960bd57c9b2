"""LangChain bridge.

Mirrors /root/reference/spacy_llm/models/langchain/model.py:14-182: a thin
adapter that instantiates any ``langchain_community.llms`` class by its
``type_to_cls_dict`` id (failing through the known model-id argument names),
queries via ``model.invoke`` and dynamically registers one
``langchain.<ClassName>.v1`` model name per available LLM class.

``langchain`` is not installed in this container, so the import is gated and
the class dict is injectable (``get_type_to_cls_dict``) — tests drive the
full init/fail-through/query path with fakes.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, List, Optional, Type

try:
    langchain_community = importlib.import_module("langchain_community")
    from langchain_community import llms as _lc_llms  # noqa: F401
except ImportError:
    langchain_community = None
    _lc_llms = None


def has_langchain() -> bool:
    return langchain_community is not None


class LangChainValidationError(Exception):
    """Stands in for pydantic's ValidationError when langchain is absent;
    fakes raise it to exercise the model-id fail-through."""

    def errors(self):
        return []


class LangChainModel:
    """Flat-prompt adapter over a LangChain LLM instance."""

    requires_actor_pool = True  # wraps a remote-API client: bounded actor pool

    #: injectable for tests; production resolves langchain_community.llms
    _type_to_cls_dict: Optional[Dict[str, Type]] = None

    def __init__(
        self,
        name: str,
        api: str,
        config: Optional[Dict[Any, Any]] = None,
        query: Optional[Callable] = None,
        context_length: Optional[int] = None,
    ):
        self._check_installation()
        self._langchain_model = self._init_langchain_model(
            name, api, dict(config or {})
        )
        self.query = query or self.query_langchain
        self._context_length = context_length

    @classmethod
    def get_type_to_cls_dict(cls) -> Dict[str, Type]:
        if cls._type_to_cls_dict is not None:
            return cls._type_to_cls_dict
        return {
            llm_id: getattr(langchain_community.llms, llm_id)
            for llm_id in langchain_community.llms.__all__
        }

    @classmethod
    def _init_langchain_model(cls, name: str, api: str, config: Dict[Any, Any]):
        """LangChain classes disagree on the model-id kwarg name; fail
        through the known candidates (reference model.py:40-73)."""
        errors: tuple = (LangChainValidationError,)
        try:
            from pydantic import ValidationError as _VE

            errors = (LangChainValidationError, _VE)
        except ImportError:
            pass
        model_init_args = ["model", "model_name", "model_id"]
        api_cls = cls.get_type_to_cls_dict()[api]
        for model_init_arg in model_init_args:
            try:
                return api_cls(**{model_init_arg: name}, **config)
            except errors as err:
                if model_init_arg == model_init_args[-1]:
                    if any(
                        e
                        for e in err.errors()
                        if e.get("type") == "extra_forbidden"
                        and model_init_arg in (e.get("loc") or ())
                    ):
                        raise ValueError(
                            "Couldn't initialize LangChain model with known "
                            "model ID arguments."
                        ) from err
                    raise

    def __call__(self, prompts: List[str]) -> List[str]:
        return self.query(self._langchain_model, list(prompts))

    @staticmethod
    def query_langchain(model, prompts: List[str]) -> List[str]:
        return [model.invoke(p) for p in prompts]

    @property
    def context_length(self) -> Optional[int]:
        return self._context_length

    @classmethod
    def _check_installation(cls) -> None:
        if not has_langchain() and cls._type_to_cls_dict is None:
            raise ValueError(
                "The LangChain model requires `langchain` to be installed, "
                "which it is not. See https://github.com/hwchase17/langchain "
                "for installation instructions."
            )


def langchain_model_factory(class_id: str):
    """Registry factory for one langchain class id (model.py:115-141)."""

    def factory(name: str = "", query: Optional[Callable] = None,
                config: Optional[Dict[Any, Any]] = None,
                context_length: Optional[int] = None,
                langchain_class_id: str = class_id, **_ignored):
        return LangChainModel(
            name=name,
            api=langchain_class_id,
            config=config,
            query=query,
            context_length=context_length,
        )

    return factory


def register_langchain_models(register_fn: Callable[[str], Callable]) -> None:
    """Registers ``langchain.<ClassName>.v1`` per available LLM class
    (model.py:151-167). No-op when langchain is absent and no fake class
    dict is installed."""
    if not has_langchain() and LangChainModel._type_to_cls_dict is None:
        return
    for class_id, cls in LangChainModel.get_type_to_cls_dict().items():
        register_fn(f"langchain.{cls.__name__}.v1")(
            langchain_model_factory(class_id)
        )
