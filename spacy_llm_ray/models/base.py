"""Model protocol.

The reference's model contract is a callable
``Iterable[Iterable[prompt]] -> Iterable[Iterable[response]]``
(/root/reference/spacy_llm/ty.py:19-21). Our engine flattens the doc/shard
nesting into explicit shard rows inside the LLM stage, so a model is simply
``List[str] -> List[str]`` plus an optional context length (the sharding
divisor, cf. /root/reference/spacy_llm/models/rest/openai/model.py:147-173).
"""

from __future__ import annotations

from typing import List, Optional, Protocol, runtime_checkable


@runtime_checkable
class Model(Protocol):
    context_length: Optional[int]

    def __call__(self, prompts: List[str]) -> List[str]:
        ...
