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


def lemma_accuracy(
    pred_pairs: Iterable[Sequence[Sequence[str]]],
    gold_pairs: Iterable[Sequence[Sequence[str]]],
) -> Dict[str, float]:
    """Token-attribute accuracy for lemmas (reference lemma score ==
    ``Scorer.score_token_attr(examples, "lemma")``, tasks/lemma/util.py:23-28).
    Inputs: per-doc lists of (token, lemma) pairs."""
    total = correct = 0
    for pred, gold in zip(pred_pairs, gold_pairs):
        gold_map = {i: g[1] for i, g in enumerate(gold)}
        for i, p in enumerate(pred):
            total += 1
            if gold_map.get(i) == p[1]:
                correct += 1
    return {"lemma_acc": correct / total if total else 0.0}


def sentiment_accuracy(
    pred: Sequence[float], gold: Sequence[float]
) -> Dict[str, float]:
    """1 - mean absolute difference (reference sentiment score,
    tasks/sentiment/util.py:51-64)."""
    diffs = [abs(p - g) for p, g in zip(pred, gold)]
    return {
        "acc_sentiment": 1.0 - (sum(diffs) / len(diffs)) if diffs else 0.0
    }


def textcat_score(
    pred_cats: Sequence[Dict[str, float]],
    gold_cats: Sequence[Dict[str, float]],
    labels: Sequence[str],
    multi_label: bool = False,
    threshold: float = 0.5,
) -> Dict[str, float]:
    """Compact ``Scorer.score_cats`` analog (reference textcat score,
    tasks/textcat/util.py:41-52): per-label P/R/F at the threshold, macro F,
    micro P/R/F, plus exclusive-classes accuracy (argmax) when not
    multi_label."""
    tp: Dict[str, int] = {l: 0 for l in labels}
    fp: Dict[str, int] = {l: 0 for l in labels}
    fn: Dict[str, int] = {l: 0 for l in labels}
    n_correct = 0
    for p, g in zip(pred_cats, gold_cats):
        if multi_label:
            for l in labels:
                pv = p.get(l, 0.0) >= threshold
                gv = g.get(l, 0.0) >= threshold
                if pv and gv:
                    tp[l] += 1
                elif pv:
                    fp[l] += 1
                elif gv:
                    fn[l] += 1
        else:
            p_arg = max(labels, key=lambda l: p.get(l, 0.0))
            g_arg = max(labels, key=lambda l: g.get(l, 0.0))
            if p_arg == g_arg:
                n_correct += 1
                tp[p_arg] += 1
            else:
                fp[p_arg] += 1
                fn[g_arg] += 1

    def prf(t, f_p, f_n):
        p = t / (t + f_p) if t + f_p else 0.0
        r = t / (t + f_n) if t + f_n else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    out: Dict[str, float] = {}
    fsum = 0.0
    for l in labels:
        p, r, f = prf(tp[l], fp[l], fn[l])
        out[f"cats_f_per_type_{l}"] = f
        fsum += f
    out["cats_macro_f"] = fsum / len(labels) if labels else 0.0
    mp, mr, mf = prf(sum(tp.values()), sum(fp.values()), sum(fn.values()))
    out["cats_micro_p"], out["cats_micro_r"], out["cats_micro_f"] = mp, mr, mf
    if not multi_label:
        n = len(list(pred_cats))
        out["cats_accuracy"] = n_correct / n if n else 0.0
    return out
