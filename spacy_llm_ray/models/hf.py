"""HuggingFace local-model scaffolding.

Structure mirrors /root/reference/spacy_llm/models/hf/base.py:14-159 and the
six model files (dolly.py, falcon.py, llama2.py, mistral.py, openllama.py,
stablelm.py): account-prefixed name resolution, supported-name validation,
config_init/config_run merging with the reference's device/device_map
conflict rules, torch_dtype resolution, and one-time model load in
``init_model``.

Ray-Data-first residency: an HF model instance is constructed inside a
``map_batches`` actor's ``__init__`` (weights load ONCE per actor) and the
stage is scheduled with ``num_gpus`` so each actor owns a GPU — see
``hf_stage_kwargs``. This container has no torch/transformers/GPU, so the
heavy imports are gated: ``check_installation`` raises a clear error, and
tests inject fake torch/transformers modules to exercise the full
config-resolution + init + generate path offline.
"""

from __future__ import annotations

import importlib
import warnings
from typing import Any, Callable, Dict, List, Optional, Tuple

# ---- dependency gates (injectable for tests) -------------------------------


def _try_import(name: str):
    try:
        return importlib.import_module(name)
    except ImportError:
        return None


#: Overridable module handles — tests (and exotic deployments) may assign
#: fakes here before instantiating a model.
torch = _try_import("torch")
transformers = _try_import("transformers")
accelerate = _try_import("accelerate")


def has_torch() -> bool:
    return torch is not None


def has_transformers() -> bool:
    return transformers is not None


def has_accelerate() -> bool:
    return accelerate is not None


def has_torch_cuda_gpu() -> bool:
    return bool(
        torch is not None
        and getattr(getattr(torch, "cuda", None), "is_available", lambda: False)()
    )


class HuggingFaceModel:
    """Base HF model (reference hf/base.py:14-159), flat-prompt calling
    convention (the engine's shard bookkeeping lives in the stages)."""

    requires_actor_pool = True  # GPU-pinned weights: dedicated actor pool

    MODEL_NAMES: Tuple[str, ...] = ()
    HF_ACCOUNT = ""
    CONTEXT_LENGTH: Optional[int] = None

    def __init__(
        self,
        name: str,
        config_init: Optional[Dict[str, Any]] = None,
        config_run: Optional[Dict[str, Any]] = None,
        context_length: Optional[int] = None,
    ):
        self._name = (
            name if self.HF_ACCOUNT in name else f"{self.HF_ACCOUNT}/{name}"
        )
        self._context_length = context_length or self.CONTEXT_LENGTH
        default_init, default_run = self.compile_default_configs()
        self._config_init = {**default_init, **(config_init or {})}
        self._config_run = {**default_run, **(config_run or {})}

        # device vs device_map conflict rules (hf/base.py:41-55).
        if config_init:
            if "device" in config_init and "device_map" in config_init:
                warnings.warn(
                    "`device` and `device_map` are conflicting arguments - "
                    "don't set both. Dropping argument `device`."
                )
                self._config_init.pop("device")
            elif "device" in default_init and "device_map" in config_init:
                self._config_init.pop("device")
            elif "device_map" in default_init and "device" in config_init:
                self._config_init.pop("device_map")

        # Resolve torch_dtype string -> torch dtype (hf/base.py:57-71).
        if (
            has_torch()
            and "torch_dtype" in self._config_init
            and self._config_init["torch_dtype"] != "auto"
        ):
            try:
                self._config_init["torch_dtype"] = getattr(
                    torch, self._config_init["torch_dtype"]
                )
            except AttributeError as ex:
                raise ValueError(
                    f"Invalid value {self._config_init['torch_dtype']} was "
                    f"specified for `torch_dtype`. Double-check you specified "
                    f"a valid dtype."
                ) from ex

        self.check_installation()
        self._check_model()
        self._model = self.init_model()

    # ---- hooks -------------------------------------------------------------

    def init_model(self) -> Any:
        raise NotImplementedError

    def __call__(self, prompts: List[str]) -> List[str]:
        raise NotImplementedError

    # ---- shared machinery --------------------------------------------------

    def _check_model(self) -> None:
        if self._name.replace(f"{self.HF_ACCOUNT}/", "") not in self.MODEL_NAMES:
            raise ValueError(
                f"Model '{self._name}' is not supported - select one of "
                f"{self.MODEL_NAMES} instead"
            )

    @property
    def context_length(self) -> Optional[int]:
        return self._context_length

    @staticmethod
    def check_installation() -> None:
        if not has_torch():
            raise ValueError(
                "The HF model requires `torch` to be installed, which it is "
                "not. See https://pytorch.org/ for installation instructions."
            )
        if not has_transformers():
            raise ValueError(
                "The HF model requires `transformers` to be installed, which "
                "it is not. See https://huggingface.co/docs/transformers/"
                "installation for installation instructions."
            )

    @staticmethod
    def compile_default_configs() -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Default init/run configs incl. device placement (hf/base.py:127-155):
        CUDA GPU -> device cuda:0; else accelerate -> device_map auto; else
        error (when torch is present at all)."""
        default_init: Dict[str, Any] = {}
        default_run: Dict[str, Any] = {}
        if has_torch():
            default_init["torch_dtype"] = "bfloat16"
            if has_torch_cuda_gpu():
                default_init["device"] = "cuda:0"
            elif has_accelerate():
                default_init["device_map"] = "auto"
                warnings.warn(
                    "Couldn't find a CUDA GPU, so the setting "
                    "'device_map:auto' will be used, which may result in the "
                    "LLM being loaded (partly) on the CPU or even the hard "
                    "disk, which may be slow."
                )
            else:
                raise ValueError(
                    "Install CUDA to load and run the LLM on the GPU, or "
                    "install 'accelerate' to dynamically distribute the LLM "
                    "on the CPU or even the hard disk. The latter may be slow."
                )
        return default_init, default_run


class _PipelineModel(HuggingFaceModel):
    """Family whose ``init_model`` builds a ``transformers.pipeline`` and
    extracts ``generated_text`` per prompt (dolly.py:13-33, falcon.py)."""

    TRUST_REMOTE_CODE = True

    def init_model(self) -> Any:
        return transformers.pipeline(
            model=self._name, return_full_text=False, **self._config_init
        )

    def __call__(self, prompts: List[str]) -> List[str]:
        return [
            self._model(p, **self._config_run)[0]["generated_text"]
            for p in prompts
        ]

    @classmethod
    def compile_default_configs(cls) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        init, run = HuggingFaceModel.compile_default_configs()
        if cls.TRUST_REMOTE_CODE:
            init["trust_remote_code"] = True
        return init, run


class _CausalLMModel(HuggingFaceModel):
    """Family whose ``init_model`` loads tokenizer + AutoModelForCausalLM and
    generates with batch_decode (mistral.py:38-80, llama2.py, openllama.py)."""

    def init_model(self) -> Any:
        self._tokenizer = transformers.AutoTokenizer.from_pretrained(self._name)
        init_cfg = dict(self._config_init)
        device = init_cfg.pop("device", None)
        model = transformers.AutoModelForCausalLM.from_pretrained(
            self._name, **init_cfg
        )
        if device:
            model = model.to(device)
        return model

    def __call__(self, prompts: List[str]) -> List[str]:
        out: List[str] = []
        device = getattr(self._model, "device", None)
        for prompt in prompts:
            inputs = self._tokenizer(prompt, return_tensors="pt")
            # Move the tokenized batch to the model's device (the reference
            # does tp.to(self._model.device), mistral.py:73-75) — without
            # this, CPU input_ids against a cuda:0 model raise at generate.
            if device is not None and hasattr(inputs, "to"):
                inputs = inputs.to(device)
            generated = self._model.generate(
                **inputs, **self._config_run
            )
            decoded = self._tokenizer.batch_decode(
                generated[:, inputs["input_ids"].shape[1]:],
                skip_special_tokens=True,
            )
            out.append(decoded[0])
        return out


class Dolly(_PipelineModel):
    MODEL_NAMES = ("dolly-v2-3b", "dolly-v2-7b", "dolly-v2-12b")
    HF_ACCOUNT = "databricks"
    CONTEXT_LENGTH = 2048


class Falcon(_PipelineModel):
    MODEL_NAMES = (
        "falcon-rw-1b", "falcon-7b", "falcon-7b-instruct", "falcon-40b-instruct"
    )
    HF_ACCOUNT = "tiiuae"
    CONTEXT_LENGTH = 2048


class Llama2(_CausalLMModel):
    MODEL_NAMES = ("Llama-2-7b-hf", "Llama-2-13b-hf", "Llama-2-70b-hf")
    HF_ACCOUNT = "meta-llama"
    CONTEXT_LENGTH = 4096


class Mistral(_CausalLMModel):
    MODEL_NAMES = ("Mistral-7B-v0.1", "Mistral-7B-Instruct-v0.1")
    HF_ACCOUNT = "mistralai"
    CONTEXT_LENGTH = 8000

    @property
    def _is_instruct(self) -> bool:
        return "instruct" in self._name.lower()

    def __call__(self, prompts: List[str]) -> List[str]:
        # Instruct variants need the tuned chat envelope
        # (reference mistral.py:68): "<s>[INST] ... [/INST]".
        if self._is_instruct:
            prompts = [f"<s>[INST] {p} [/INST]" for p in prompts]
        return super().__call__(prompts)


class OpenLLaMA(_CausalLMModel):
    MODEL_NAMES = (
        "open_llama_3b", "open_llama_7b", "open_llama_7b_v2", "open_llama_13b"
    )
    HF_ACCOUNT = "openlm-research"
    CONTEXT_LENGTH = 2048


class StableLM(_CausalLMModel):
    MODEL_NAMES = (
        "stablelm-base-alpha-3b", "stablelm-base-alpha-7b",
        "stablelm-tuned-alpha-3b", "stablelm-tuned-alpha-7b",
    )
    HF_ACCOUNT = "stabilityai"
    CONTEXT_LENGTH = 4096

    # Tuned variants wrap prompts in the system envelope (stablelm.py:29-35);
    # kept as data so the prompt text matches the reference.
    SYSTEM_PROMPT = """
<|SYSTEM|># StableLM Tuned (Alpha version)
- StableLM is a helpful and harmless open-source AI language model developed by StabilityAI.
- StableLM is excited to be able to help the user, but will refuse to do anything that could be considered harmful to the user.
- StableLM is more than just an information source, StableLM is also able to write poetry, short stories, and make jokes.
- StableLM will refuse to participate in anything that could harm a human.
"""

    @property
    def _is_tuned(self) -> bool:
        return "tuned" in self._name

    def __call__(self, prompts: List[str]) -> List[str]:
        if self._is_tuned:
            prompts = [
                f"{self.SYSTEM_PROMPT}<|USER|>{p}<|ASSISTANT|>" for p in prompts
            ]
        return super().__call__(prompts)


HF_CLASSES: Dict[str, type] = {
    "spacy.Dolly.v1": Dolly,
    "spacy.Falcon.v1": Falcon,
    "spacy.Llama2.v1": Llama2,
    "spacy.Mistral.v1": Mistral,
    "spacy.OpenLLaMA.v1": OpenLLaMA,
    "spacy.StableLM.v1": StableLM,
}


def hf_stage_kwargs(num_gpus: float = 1.0, concurrency=None,
                    batch_size: int = 16) -> Dict[str, Any]:
    """map_batches kwargs for an HF-model stage: fixed-size actor pool, one
    GPU per actor, small batches (generation is the bottleneck, not I/O).
    Usage::

        ds.map_batches(NerStage, fn_constructor_kwargs=dict(model_factory=
            lambda: make_model("spacy.Dolly.v1", name="dolly-v2-3b"), ...),
            **hf_stage_kwargs())
    """
    import ray

    if concurrency is None:
        gpus = int(ray.cluster_resources().get("GPU", 0))
        concurrency = max(1, gpus)
    return dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_gpus=num_gpus,
    )


def register_hf_models(register_fn: Callable[[str], Callable]) -> None:
    """Hook the six HF names into a model registry (called by
    models.registry at import)."""
    for reg_name, cls in HF_CLASSES.items():
        def factory(name: str = "", config_init=None, config_run=None,
                    context_length: Optional[int] = None, _cls=cls, **_ignored):
            if not name:
                name = _cls.MODEL_NAMES[0]
            return _cls(
                name=name, config_init=config_init, config_run=config_run,
                context_length=context_length,
            )

        register_fn(reg_name)(factory)
