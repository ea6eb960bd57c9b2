"""Label normalizers (reference: /root/reference/spacy_llm/registry/normalizer.py:6-29).

The lowercase normalizer is the default label normalizer across builtin tasks
(/root/reference/spacy_llm/tasks/builtin_task.py:327)."""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List


def strip_normalizer(s: str) -> str:
    return s.strip()


def lowercase_normalizer(s: str) -> str:
    return s.strip().lower()


def build_label_dict(
    labels: Iterable[str], normalizer: Callable[[str], str] = lowercase_normalizer
) -> Dict[str, str]:
    """Map normalized label -> original label (reference keeps this as
    ``task._label_dict``)."""
    return {normalizer(label): label for label in labels}


def split_labels(labels) -> List[str]:
    """Comma-separated label string -> list (reference: util.py:9-19)."""
    if isinstance(labels, str):
        labels = labels.split(",")
    return [label.strip() for label in labels if label and label.strip()]
