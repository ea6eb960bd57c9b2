"""Evaluation helpers (reference analogs:
``get_ner_prf`` /root/reference/spacy_llm/tasks/ner/util.py:33-38,
``Scorer.score_links(..., negative_labels=[NIL])``
/root/reference/spacy_llm/tasks/entity_linker/util.py:75-80), plus the
driver-side triple P/R join the north rule scores on."""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple

from .tasks.entity_linker import NIL
from .tokenizer import Span


def span_prf(
    pred: Sequence[Span], gold: Sequence[Span]
) -> Dict[str, float]:
    """Micro P/R/F over (start_char, end_char, label) span identity."""
    p = {(s.start_char, s.end_char, s.label) for s in pred}
    g = {(s.start_char, s.end_char, s.label) for s in gold}
    tp = len(p & g)
    precision = tp / len(p) if p else 0.0
    recall = tp / len(g) if g else 0.0
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"ents_p": precision, "ents_r": recall, "ents_f": f}


def link_accuracy(
    pred: Sequence[Span], gold: Sequence[Span]
) -> Dict[str, float]:
    """EL accuracy over aligned mention lists, NIL treated as negative
    (score_links semantics)."""
    pairs = [
        (p.kb_id, g.kb_id)
        for p, g in zip(pred, gold)
        if g.kb_id and g.kb_id != NIL
    ]
    if not pairs:
        return {"nil_accuracy": 1.0, "link_accuracy": 0.0, "n_links": 0}
    correct = sum(1 for pk, gk in pairs if pk == gk)
    return {
        "link_accuracy": correct / len(pairs),
        "n_links": len(pairs),
        "nil_accuracy": 1.0,
    }


def triple_prf(
    pred: Iterable[Tuple], gold: Iterable[Tuple]
) -> Dict[str, float]:
    """P/R/F over (conv_id, subj, pred, obj)-keyed triple sets — the ≥0.95
    agreement criterion."""
    p: Set[Tuple] = set(pred)
    g: Set[Tuple] = set(gold)
    tp = len(p & g)
    precision = tp / len(p) if p else 0.0
    recall = tp / len(g) if g else 0.0
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"p": precision, "r": recall, "f": f, "tp": tp, "n_pred": len(p), "n_gold": len(g)}
