"""Prompt builders.

The reference renders sandboxed Jinja2 templates per shard, recompiling the
environment on every ``generate_prompts`` call
(/root/reference/spacy_llm/tasks/builtin_task.py:57-97). Our engine uses plain
Python prompt builders structured after the reference's builtin templates
(/root/reference/spacy_llm/tasks/templates/*.jinja) and constructs them once
per actor — prompt text is engine-defined, response *parsing* is
reference-exact.

Every builder embeds the document text between ``'''`` fences so the
deterministic mock models (and any echo-style model) can recover it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

TEXT_FENCE = "'''"


def fence(text: str) -> str:
    return f"{TEXT_FENCE}\n{text}\n{TEXT_FENCE}"


def extract_fenced_text(prompt: str) -> str:
    """Recover the document text from a fenced prompt (last fence pair)."""
    first = prompt.find(f"{TEXT_FENCE}\n")
    last = prompt.rfind(f"\n{TEXT_FENCE}")
    if first == -1 or last == -1 or last <= first:
        return prompt
    return prompt[first + len(TEXT_FENCE) + 1 : last]


def _labels_block(labels: Sequence[str], label_definitions: Optional[Dict[str, str]]) -> str:
    out = [f"Labels: {', '.join(labels)}"]
    if label_definitions:
        out.append("Label definitions:")
        out.extend(f"- {label}: {definition}" for label, definition in label_definitions.items())
    return "\n".join(out)


def ner_v3_prompt(
    text: str,
    labels: Sequence[str],
    label_definitions: Optional[Dict[str, str]] = None,
    description: str = "",
    examples: Optional[Sequence] = None,
    i_shard: int = 0,
    n_shards: int = 1,
) -> str:
    """Chain-of-thought span-extraction prompt (after spacy.NER.v3,
    /root/reference/spacy_llm/tasks/templates/ner.v3.jinja)."""
    parts = [
        "You are an expert Named Entity Recognition (NER) system.",
        "Identify all entity spans in the text below and output one line per span as:",
        "N. span text | True|False | LABEL | reason",
        description,
        _labels_block(labels, label_definitions),
    ]
    if examples:
        parts.append("Examples:")
        for ex in examples:
            parts.append(fence(ex.text))
            parts.extend(f"{i + 1}. {sr.to_str()}" for i, sr in enumerate(ex.spans))
    if n_shards > 1:
        parts.append(f"(Shard {i_shard + 1} of {n_shards}.)")
    parts.append("Text:")
    parts.append(fence(text))
    return "\n".join(p for p in parts if p)


def spancat_v3_prompt(*args, **kwargs) -> str:
    return ner_v3_prompt(*args, **kwargs)


def rel_v1_prompt(
    preannotated_text: str,
    labels: Sequence[str],
    label_definitions: Optional[Dict[str, str]] = None,
    examples: Optional[Sequence] = None,
    i_shard: int = 0,
    n_shards: int = 1,
) -> str:
    """Relation-extraction prompt (after spacy.REL.v1,
    /root/reference/spacy_llm/tasks/templates/rel.v1.jinja). The text carries
    ``[ENT<i>:<LABEL>]`` markers; output is one JSON object per line:
    {"dep": 0, "dest": 1, "relation": "..."}."""
    parts = [
        "You are an expert Relation Extraction system.",
        'Entities are pre-annotated as [ENT<index>:<label>] markers directly after each mention.',
        'Output one JSON object per relation per line: {"dep": <ent index>, "dest": <ent index>, "relation": <label>}.',
        _labels_block(labels, label_definitions),
    ]
    if examples:
        parts.append("Examples:")
        for ex in examples:
            # RELExample: preannotate its text from its ents; answers are the
            # relation JSON lines (rel.v1.jinja example block shape).
            if hasattr(ex, "ents"):
                from .tasks.rel import preannotate
                from .tokenizer import Span

                spans = [
                    Span(0, 0, e.label, "", e.start_char, e.end_char,
                         ex.text[e.start_char:e.end_char])
                    for e in ex.ents
                ]
                parts.append(fence(preannotate(ex.text, spans)))
                parts.extend(
                    '{"dep": %d, "dest": %d, "relation": "%s"}'
                    % (r["dep"], r["dest"], r["relation"])
                    for r in ex.relations
                )
            else:
                parts.append(fence(ex["text"]))
                parts.extend(ex.get("answers", []))
    if n_shards > 1:
        parts.append(f"(Shard {i_shard + 1} of {n_shards}.)")
    parts.append("Text:")
    parts.append(fence(preannotated_text))
    return "\n".join(p for p in parts if p)


def el_v1_prompt(
    highlighted_text: str,
    mentions: Sequence[str],
    entity_ids: Sequence[Sequence[str]],
    entity_descriptions: Sequence[Sequence[str]],
    examples: Optional[Sequence] = None,
    i_shard: int = 0,
    n_shards: int = 1,
) -> str:
    """Entity-linking prompt (after spacy.EntityLinker.v1,
    /root/reference/spacy_llm/tasks/templates/entity_linker.v1.jinja).
    Mentions are *highlighted*; per mention the top-n candidates (sorted by
    prior) are listed. Expected answer per mention:
    ``*<mention>* ::: <<entity id>>`` (NIL allowed)."""
    mentions_str = ", ".join(f"*{m}*" for m in mentions)
    parts = [
        "You are an expert Entity Linking system.",
        "For each highlighted mention, answer with one line:",
        "*<mention>* ::: <<entity id>> — choose from the listed candidates or NIL.",
    ]
    if examples:
        parts.append("Examples:")
        for ex in examples:
            # ELExample (entity_linker.v1.jinja example block shape).
            parts.append(fence(ex.text))
            parts.append(f"Mentions: {ex.mentions_str}")
            for mention, ids, descs in zip(
                ex.mentions, ex.entity_ids, ex.entity_descriptions
            ):
                cands = "; ".join(f"{i} ({d})" for i, d in zip(ids, descs))
                # Indented so the current-doc candidate block (line-anchored
                # "- *m*:") remains unambiguous to response generators.
                parts.append(f"  - *{mention}*: candidates: {cands}")
            parts.append("SOLUTION:")
            parts.extend(
                f"*{m}* ::: <{sol}>" for m, sol in zip(ex.mentions, ex.solutions)
            )
        parts.append("End of examples.")
    if n_shards > 1:
        parts.append(f"(Shard {i_shard + 1} of {n_shards}.)")
    parts.append("Text:")
    parts.append(fence(highlighted_text))
    parts.append(f"Mentions: {mentions_str}")
    for mention, ids, descs in zip(mentions, entity_ids, entity_descriptions):
        cands = "; ".join(f"{i} ({d})" for i, d in zip(ids, descs))
        parts.append(f"- *{mention}*: candidates: {cands}")
    return "\n".join(parts)


def textcat_prompt(
    text: str,
    labels: Sequence[str],
    label_definitions: Optional[Dict[str, str]] = None,
    exclusive_classes: bool = False,
    allow_none: bool = True,
    i_shard: int = 0,
    n_shards: int = 1,
) -> str:
    """After spacy.TextCat.v3 (templates/textcat.v3.jinja). Binary tasks
    expect POS/NEG; multilabel expects a comma-separated label list."""
    if len(labels) == 1:
        instruction = f"Answer POS if the text is about {labels[0]}, else NEG."
    else:
        kind = "exactly one label" if exclusive_classes else "all applicable labels, comma-separated"
        instruction = f"Classify the text with {kind}."
    parts = [
        "You are an expert Text Classification system.",
        instruction,
        _labels_block(labels, label_definitions),
        "Text:",
        fence(text),
    ]
    return "\n".join(p for p in parts if p)


def lemma_prompt(text: str, i_shard: int = 0, n_shards: int = 1) -> str:
    """After spacy.Lemma.v1 (templates/lemma.v1.jinja): one ``token: lemma``
    line per token."""
    return "\n".join(
        [
            "You are an expert lemmatizer.",
            "Output one line per token as 'token: lemma'.",
            "Text:",
            fence(text),
        ]
    )


def sentiment_prompt(text: str, i_shard: int = 0, n_shards: int = 1) -> str:
    return "\n".join(
        [
            "Rate the sentiment of the text between 0.0 (negative) and 1.0 (positive).",
            "Answer with a single float, prefixed by 'Answer:'.",
            "Text:",
            fence(text),
        ]
    )


def summarization_prompt(text: str, max_n_words: Optional[int] = None,
                         i_shard: int = 0, n_shards: int = 1) -> str:
    limit = f" in at most {max_n_words} words" if max_n_words else ""
    return "\n".join(
        [f"Summarize the following text{limit}.", "Text:", fence(text)]
    )


def translation_prompt(text: str, target_lang: str, source_lang: Optional[str] = None,
                       i_shard: int = 0, n_shards: int = 1) -> str:
    src = f" from {source_lang}" if source_lang else ""
    return "\n".join(
        [f"Translate the following text{src} to {target_lang}.", "Text:", fence(text)]
    )


def raw_prompt(text: str, i_shard: int = 0, n_shards: int = 1) -> str:
    """After spacy.Raw.v1: pass the document text through as the prompt."""
    return fence(text)


def noop_prompt(text: str, i_shard: int = 0, n_shards: int = 1) -> str:
    """spacy.NoOp.v1's constant prompt (tasks/noop.py:21-66)."""
    return "Don't do anything."
