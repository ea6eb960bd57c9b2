"""TextCat v1-3 response parser
(/root/reference/spacy_llm/tasks/textcat/parser.py:9-53)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List

from ..normalizers import build_label_dict, lowercase_normalizer


@dataclass
class TextCatConfig:
    labels: List[str]
    exclusive_classes: bool = False
    allow_none: bool = True
    normalizer: Callable[[str], str] = lowercase_normalizer
    label_dict: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if not self.label_dict:
            self.label_dict = build_label_dict(self.labels, self.normalizer)

    @property
    def use_binary(self) -> bool:
        return len(self.label_dict) == 1


def parse_textcat_response(cfg: TextCatConfig, response: str) -> Dict[str, float]:
    """Binary: ``"POS"`` -> 1.0 else 0.0. Multilabel: comma-split, normalize,
    unknown dropped; exclusive + multiple answers -> all zeros."""
    response = response.strip()
    if cfg.use_binary:
        label = list(cfg.label_dict.values())[0]
        return {label: 1.0 if response.upper() == "POS" else 0.0}
    categories = {label: 0.0 for label in cfg.label_dict.values()}
    pred_labels = response.split(",")
    if cfg.exclusive_classes and len(pred_labels) > 1:
        pred_labels = []
    for pred in pred_labels:
        norm = cfg.normalizer(pred.strip())
        if norm in cfg.label_dict:
            categories[cfg.label_dict[norm]] = 1.0
    return categories
