"""Stateful LLM stages (actor-pool ``map_batches`` callables).

Each stage fuses the reference's ``_process_docs`` core operator
(/root/reference/spacy_llm/pipeline/llm.py:209-319) into one Arrow-batch
transform: prompt render (+ context-window sharding) -> ONE batched model call
-> per-shard response parse -> shard reduce — all inside a single actor
invocation, so doc->shards->doc never crosses a shuffle (SURVEY.md §2.6).

Actor residency (SURVEY.md §2.5): model client, compiled prompt builders,
label dicts, few-shot examples and the EL KB are built once per actor in
``__init__`` (the reference recompiles its Jinja env per batch,
builtin_task.py:68-69 — loading once per actor is a deliberate improvement).
Use as::

    docs.map_batches(NerStage, fn_constructor_kwargs=dict(labels=..., model=...),
                     batch_format="pyarrow", batch_size=64,
                     concurrency=(1, n), num_cpus=1)

The KB for ElStage may be passed as a ``ray.ObjectRef`` (broadcast once via
``ray.put``; fetched zero-copy per actor) instead of a direct object.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import pyarrow as pa

from ..kb import InMemoryKB
from ..parsing import find_substrings  # noqa: F401  (re-exported for stage authors)
from ..tasks.entity_linker import (
    NIL,
    highlight_mentions,
    parse_el_solutions,
    resolve_el_response,
)
from ..tasks.rel import (
    ENT_MARKER_RE,
    parse_rel_response,
    preannotate,
    rel_tokenize,
)
from ..tasks.sharding import Shard, make_shard_mapper
from ..tasks.span import (
    SpanTaskConfig,
    parse_span_response,
    parse_span_response_cot,
)
from ..templates import el_v1_prompt, ner_v3_prompt
from ..tokenizer import Span, filter_spans, tokenize
from .schemas import LLM_IO_TYPE, MENTION_TYPE, REL_TYPE


def _maybe_get(obj):
    """Resolve a ray.ObjectRef constructor arg (broadcast side-data)."""
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


def _span_from_mention(m: Dict) -> Span:
    return Span(
        m["start_tok"], m["end_tok"], m["label"], m.get("kb_id") or "",
        m["start_char"], m["end_char"], m["text"],
    )


def _mention_dict(s: Span) -> Dict:
    return {
        "start_char": s.start_char,
        "end_char": s.end_char,
        "start_tok": s.start_tok,
        "end_tok": s.end_tok,
        "label": s.label,
        "text": s.text,
        "kb_id": s.kb_id,
    }


class _ShardingMixin:
    """Shared prompt/shard bookkeeping: map every doc in the batch to shards,
    render all prompts, make ONE model call, then iterate (doc, shards,
    responses) triples."""

    _example_type = None  # set by stages that accept few-shot examples

    def set_examples(self, examples) -> None:
        """Install few-shot examples (reader dicts or example objects) —
        the reference's ``_set_prompt_examples`` (builtin_task.py:165-173):
        dicts are validated/coerced into the stage's example type, so both
        cfg-loaded reader output and serde-restored dicts render correctly."""
        from ..tasks.examples import coerce_examples

        if self._example_type is not None:
            self._examples = coerce_examples(examples, self._example_type)
        else:
            self._examples = list(examples) if examples else None

    def _map_and_call(self, items: List[tuple], render: Callable):
        """items: list of (text, tokens). render(shard_text, i, n) -> prompt.
        Returns list of (shards, responses) aligned with items.

        Renders are memoized per doc so the shard-fit probe and the final
        prompt build share one render for the common single-shard case."""
        all_shards: List[List[Shard]] = []
        prompts: List[str] = []
        def make_crender():
            # Exactly 3 parameters — the shard mapper feeds a 4th char-offset
            # argument only to >=4-param renderers (offset-aware probes).
            cache: dict = {}

            def crender(st, i, n):
                key = (st, i, n)
                v = cache.get(key)
                if v is None:
                    v = render(st, i, n)
                    cache[key] = v
                return v

            return crender

        for text, tokens in items:
            crender = make_crender()

            shards = self._shard_mapper(text, tokens, self._context_length, crender)
            all_shards.append(shards)
            prompts.extend(crender(s.text, s.i_shard, s.n_shards) for s in shards)
        responses = self._model(prompts)
        responses = list(responses)
        if len(responses) != len(prompts):
            # The prompt/shard/response relationship is strictly 1:1
            # (reference contract, ty.py:95-118); a silent zip-truncate here
            # would misalign every downstream doc.
            raise ValueError(
                f"model returned {len(responses)} responses for {len(prompts)} prompts"
            )
        out = []
        ri = 0
        for shards in all_shards:
            rs = responses[ri : ri + len(shards)]
            ps = prompts[ri : ri + len(shards)]
            ri += len(shards)
            out.append((shards, rs, ps))
        return out

    def _maybe_save_io(self, batch: pa.Table, results) -> pa.Table:
        """Append an ``llm_io`` struct column (prompt/response lists per doc)
        when save_io is enabled — the analog of the reference's
        ``Doc.user_data['llm_io']`` capture (pipeline/llm.py:296-314)."""
        if not getattr(self, "_save_io", False):
            return batch
        col = [
            {"prompt": list(prompts), "response": list(responses)}
            for _shards, responses, prompts in results
        ]
        return batch.append_column("llm_io", pa.array(col, type=LLM_IO_TYPE))


class NerStage(_ShardingMixin):
    """Span extraction (spacy.NER.v3 CoT by default; v1/v2 line format with
    ``cot=False``). Adds a ``mentions`` list<struct> column.

    NER assigns ``filter_spans``-filtered entities
    (/root/reference/spacy_llm/tasks/ner/task.py:94-100); pass
    ``assign="spans"`` for SpanCat semantics (sorted, overlaps kept,
    tasks/spancat/task.py:82-88).
    """

    def __init__(
        self,
        labels: Sequence[str],
        model,
        label_definitions: Optional[Dict[str, str]] = None,
        description: str = "",
        examples: Optional[Sequence] = None,
        alignment_mode: str = "contract",
        case_sensitive_matching: bool = False,
        single_match: bool = False,
        allow_overlap: bool = False,
        cot: bool = True,
        assign: str = "ents",
        text_col: str = "text",
        out_col: str = "mentions",
        prompt_builder: Callable = ner_v3_prompt,
        save_io: bool = False,
    ):
        self._model = _maybe_get(model)
        self._cfg = SpanTaskConfig(
            labels=list(labels),
            alignment_mode=alignment_mode,
            case_sensitive_matching=case_sensitive_matching,
            single_match=single_match,
            allow_overlap=allow_overlap,
        )
        self._labels = list(labels)
        self._label_definitions = label_definitions
        self._description = description
        from ..tasks.examples import SpanCoTExample, SpanExample

        self._example_type = SpanCoTExample if cot else SpanExample
        self.set_examples(examples)
        self._cot = cot
        self._assign = assign
        self._text_col = text_col
        self._out_col = out_col
        self._prompt_builder = prompt_builder
        self._save_io = save_io
        self._shard_mapper = make_shard_mapper()
        self._context_length = getattr(self._model, "context_length", None)

    def _render(self, shard_text: str, i_shard: int, n_shards: int) -> str:
        return self._prompt_builder(
            shard_text,
            self._labels,
            label_definitions=self._label_definitions,
            description=self._description,
            examples=self._examples,
            i_shard=i_shard,
            n_shards=n_shards,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._text_col].to_pylist()
        items = [(t, tokenize(t)) for t in texts]
        results = self._map_and_call(items, self._render)

        parse = parse_span_response_cot if self._cot else parse_span_response
        mentions_col = []
        for (text, tokens), (shards, responses, _prompts) in zip(items, results):
            spans: List[Span] = []
            for shard, response in zip(shards, responses):
                sh_tokens = (
                    tokens
                    if len(shards) == 1
                    else tokenize(shard.text)
                )
                for s in parse(self._cfg, shard.text, sh_tokens, response):
                    if len(shards) == 1:
                        spans.append(s)
                    else:
                        spans.append(
                            Span(
                                s.start_tok + shard.tok_start,
                                s.end_tok + shard.tok_start,
                                s.label,
                                s.kb_id,
                                s.start_char + shard.char_offset,
                                s.end_char + shard.char_offset,
                                s.text,
                            )
                        )
            if self._assign == "ents":
                spans = filter_spans(spans)
            else:
                spans = sorted(set(spans))
            mentions_col.append([_mention_dict(s) for s in spans])

        batch = batch.append_column(
            self._out_col, pa.array(mentions_col, type=pa.list_(MENTION_TYPE))
        )
        return self._maybe_save_io(batch, results)


class RelStage(_ShardingMixin):
    """Relation extraction (spacy.REL.v1). Consumes the ``mentions`` column,
    preannotates the prompt text with global ``[ENTi:LABEL]`` markers, and adds
    a ``rel`` list<struct<dep,dest,relation>> column whose indices point into
    ``mentions``.

    Sharding runs over the *preannotated* text with marker-atomic tokens; the
    markers keep their global numbering, so per-shard index validity is
    membership in the shard's marker set (equivalent to the reference's
    shard-local ``0 <= i < len(shard.ents)`` check, rel/parser.py:27-29).
    Shard results are concatenated (rel/util.py:79-102).
    """

    def __init__(
        self,
        labels: Sequence[str],
        model,
        label_definitions: Optional[Dict[str, str]] = None,
        examples: Optional[Sequence] = None,
        text_col: str = "text",
        mentions_col: str = "mentions",
        out_col: str = "rel",
        save_io: bool = False,
    ):
        from ..templates import rel_v1_prompt

        self._model = _maybe_get(model)
        self._labels = list(labels)
        self._label_definitions = label_definitions
        from ..tasks.examples import RELExample

        self._example_type = RELExample
        self.set_examples(examples)
        self._text_col = text_col
        self._mentions_col = mentions_col
        self._out_col = out_col
        self._save_io = save_io
        self._prompt_builder = rel_v1_prompt
        self._shard_mapper = make_shard_mapper()
        self._context_length = getattr(self._model, "context_length", None)

    def _render(self, shard_text: str, i_shard: int, n_shards: int) -> str:
        return self._prompt_builder(
            shard_text,
            self._labels,
            label_definitions=self._label_definitions,
            examples=self._examples,
            i_shard=i_shard,
            n_shards=n_shards,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._text_col].to_pylist()
        mentions_lists = batch[self._mentions_col].to_pylist()

        from ..tasks.rel import _REL_TOKEN_RE
        from ..tasks.sharding import LazyTokenList

        items = []
        for text, mentions in zip(texts, mentions_lists):
            pre = preannotate(text, [_span_from_mention(m) for m in mentions])
            # Tokens feed ONLY the shard mapper here (REL parsing works on
            # marker ids, not token alignment): defer Token construction —
            # single-shard docs need just the count.
            items.append((pre, LazyTokenList(pre, rel_tokenize, _REL_TOKEN_RE)))
        results = self._map_and_call(items, self._render)

        rel_col = []
        for (pre, _), (shards, responses, _prompts) in zip(items, results):
            rels = []
            for shard, response in zip(shards, responses):
                valid_ids = {int(m) for m in ENT_MARKER_RE.findall(shard.text)}
                for item in parse_rel_response(response, valid_ids=valid_ids):
                    rels.append(
                        {"dep": item.dep, "dest": item.dest, "relation": item.relation}
                    )
            rel_col.append(rels)

        batch = batch.append_column(
            self._out_col, pa.array(rel_col, type=pa.list_(REL_TYPE))
        )
        return self._maybe_save_io(batch, results)


class ElStage(_ShardingMixin):
    """Entity linking (spacy.EntityLinker.v1). Rewrites the ``mentions``
    column with ``kb_id`` filled in.

    The KB is broadcast side-data (pass a ray.ObjectRef). Per doc(-shard):
    top-n candidates by prior per mention (candidate_selector.py:36-60),
    auto-NIL for mentions without candidates (task.py:126-133), ``*``
    highlighting in the prompt only, solution parsing + the
    all-entities-resolved guard (task.py:211-236). Mentions straddling a
    shard boundary are auto-NILed (the reference drops them during spaCy doc
    slicing; we keep the mention but cannot prompt for it).
    """

    def __init__(
        self,
        kb,
        model,
        top_n: int = 5,
        examples: Optional[Sequence] = None,
        text_col: str = "text",
        mentions_col: str = "mentions",
        save_io: bool = False,
    ):
        self._kb: InMemoryKB = _maybe_get(kb)
        self._model = _maybe_get(model)
        self._top_n = top_n
        from ..tasks.examples import ELExample

        self._example_type = ELExample
        self.set_examples(examples)
        self._text_col = text_col
        self._mentions_col = mentions_col
        self._save_io = save_io
        self._shard_mapper = make_shard_mapper()
        self._context_length = getattr(self._model, "context_length", None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._text_col].to_pylist()
        mentions_lists = batch[self._mentions_col].to_pylist()

        # Shard on the raw text; EL prompts are rendered per shard with the
        # shard's own mentions (the reference re-runs candidate selection per
        # shard, task.py:147-158).
        out_col: List[List[Dict]] = []
        all_prompts: List[str] = []
        plan = []  # (doc_idx, shard_mention_indices, has_cands)
        for di, (text, mentions) in enumerate(zip(texts, mentions_lists)):
            tokens = tokenize(text)
            # Candidate lookup once per doc (mention surface -> candidates is
            # offset-independent); reused by every shard AND by the shard-fit
            # probe below.
            cands_all = (
                self._kb.get_candidates_batch(
                    [m["text"] for m in mentions], top_n=self._top_n
                )
                if mentions
                else []
            )
            has_cands_all = [{c.id for c in cs} != {NIL} for cs in cands_all]

            # Shard-fit probe accounts for the candidate shard's OWN
            # mention/candidate block (mentions wholly inside
            # [offset, offset+len)) — the reference sizes the fully rendered
            # prompt because entity descriptions are injected after text
            # slicing (tasks/util/sharding.py:42-60); an empty-block probe
            # under-counts and can overflow the context. Token counts are
            # whitespace-additive, so each mention's block contribution is
            # precomputed ONCE per doc and the probe appends an
            # equal-token filler instead of re-formatting candidate lines
            # on every fit check.
            block_tokens = []
            for j, m in enumerate(mentions):
                if not has_cands_all[j]:
                    block_tokens.append(0)
                    continue
                cands_line = "; ".join(
                    f"{c.id} ({c.description})" for c in cands_all[j]
                )
                line = f"- *{m['text']}*: candidates: {cands_line}"
                piece = f"*{m['text']}*,"
                block_tokens.append(len(line.split()) + len(piece.split()))

            def probe(st, i, n, off, _m=mentions, _bt=block_tokens):
                hi = off + len(st)
                k = sum(
                    _bt[j]
                    for j, m in enumerate(_m)
                    if m["start_char"] >= off and m["end_char"] <= hi
                )
                base = el_v1_prompt(
                    st, [], [], [], examples=self._examples,
                    i_shard=i, n_shards=n,
                )
                return base + " x" * k if k else base

            probe.accepts_offset = True  # opt into the 4-arg offset contract
            shards = self._shard_mapper(
                text, tokens, self._context_length, probe,
            )
            out_col.append([dict(m) for m in mentions])
            for shard in shards:
                lo, hi = shard.char_offset, shard.char_offset + len(shard.text)
                midx = [
                    i
                    for i, m in enumerate(mentions)
                    if m["start_char"] >= lo and m["end_char"] <= hi
                ]
                if not midx:
                    continue
                local = [
                    _span_from_mention(
                        {
                            **mentions[i],
                            "start_char": mentions[i]["start_char"] - lo,
                            "end_char": mentions[i]["end_char"] - lo,
                        }
                    )
                    for i in midx
                ]
                cands = [cands_all[i] for i in midx]
                has_cands = [has_cands_all[i] for i in midx]
                highlighted = highlight_mentions(shard.text, local, has_cands)
                included = [i for i, h in enumerate(has_cands) if h]
                prompt = el_v1_prompt(
                    highlighted,
                    [local[i].text for i in included],
                    [[c.id for c in cands[i]] for i in included],
                    [[c.description for c in cands[i]] for i in included],
                    examples=self._examples,
                    i_shard=shard.i_shard,
                    n_shards=shard.n_shards,
                )
                all_prompts.append(prompt)
                plan.append((di, midx, local, has_cands))

        responses = list(self._model(all_prompts))
        if len(responses) != len(all_prompts):
            # Same strict 1:1 prompt/response contract as _map_and_call; a
            # silent zip-truncate would leave trailing mentions NIL unnoticed.
            raise ValueError(
                f"model returned {len(responses)} responses for "
                f"{len(all_prompts)} prompts"
            )

        io_col = [{"prompt": [], "response": []} for _ in texts]
        for (di, midx, local, has_cands), response, prompt in zip(
            plan, responses, all_prompts
        ):
            solutions = parse_el_solutions(response)
            resolved = resolve_el_response(local, has_cands, solutions)
            for i, span in zip(midx, resolved):
                out_col[di][i]["kb_id"] = span.kb_id
            io_col[di]["prompt"].append(prompt)
            io_col[di]["response"].append(response)
        # Mentions never covered by a shard (straddlers) -> NIL.
        for ms in out_col:
            for m in ms:
                if not m.get("kb_id"):
                    m["kb_id"] = NIL

        idx = batch.schema.get_field_index(self._mentions_col)
        batch = batch.set_column(
            idx,
            self._mentions_col,
            pa.array(out_col, type=pa.list_(MENTION_TYPE)),
        )
        if self._save_io:
            batch = batch.append_column("llm_io", pa.array(io_col, type=LLM_IO_TYPE))
        return batch

class KGStage:
    """Fused NER -> REL -> EL (-> triple explode) stage: one actor pool, one
    batch pass.

    The three logical stages stay available as separate classes (NerStage /
    RelStage / ElStage) for stage-level pipelines; the flagship fuses them —
    a conversation's mentions never leave the actor between extraction steps,
    eliminating two actor pools and two object-store exchanges per batch.
    """

    def __init__(self, ner_kwargs: Dict, rel_kwargs: Dict, el_kwargs: Dict,
                 explode: bool = True):
        self._ner = NerStage(**ner_kwargs)
        self._rel = RelStage(**rel_kwargs)
        self._el = ElStage(**el_kwargs)
        self._explode = explode

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._ner(batch)
        batch = self._rel(batch)
        batch = self._el(batch)
        if self._explode:
            from .triples import explode_triples

            return explode_triples(batch)
        return batch


class LLMTaskStage(_ShardingMixin):
    """Generic scalar-output LLM stage (Sentiment / Summarization /
    Translation / Raw / TextCat / Lemma wiring via prompt_fn + parse_fn +
    reduce).

    Built-in reduces mirror the reference's shard reducers:
    - "join": " ".join of shard strings (summarization/util.py:24-44),
    - "weighted_mean": token-count-weighted mean, None-propagating
      (sentiment/util.py:24-48),
    - "weighted_mean_cats": per-category weighted mean (textcat/util.py:54-77),
    - "concat_list": list concatenation (lemma/util.py:31-44).
    """

    _REDUCERS = ("join", "weighted_mean", "weighted_mean_cats", "concat_list", "first")

    def __init__(
        self,
        model,
        prompt_fn: Callable[..., str],
        parse_fn: Callable[[str], Any],
        out_col: str,
        out_type: pa.DataType = pa.string(),
        reduce: str = "join",
        text_col: str = "text",
        save_io: bool = False,
        post_fn: Optional[Callable[[Any, Sequence], Any]] = None,
        shard_post_fn: Optional[Callable[[Any, int], Any]] = None,
    ):
        assert reduce in self._REDUCERS, reduce
        self._model = _maybe_get(model)
        self._prompt_fn = prompt_fn
        self._parse_fn = parse_fn
        self._out_col = out_col
        self._out_type = out_type
        self._reduce = reduce
        self._text_col = text_col
        self._save_io = save_io
        # post_fn(combined_value, doc_tokens) -> final value: per-doc
        # finalizers that need the document's own tokenization (the stage
        # already tokenizes, so no separate corpus-wide count pass or
        # driver-side dict is needed).
        self._post_fn = post_fn
        # shard_post_fn(parsed_value, n_shard_tokens) -> value: per-SHARD
        # finalizers applied before the reduce, for guards the reference
        # runs shard-by-shard — e.g. the Lemma count guard
        # (tasks/lemma/task.py:56-61 skips only the mismatched SHARD, not
        # the whole doc; a post-reduce guard would null every shard's
        # lemmas on one bad shard).
        self._shard_post_fn = shard_post_fn
        self._shard_mapper = make_shard_mapper()
        self._context_length = getattr(self._model, "context_length", None)

    def _render(self, shard_text: str, i_shard: int, n_shards: int) -> str:
        return self._prompt_fn(shard_text, i_shard=i_shard, n_shards=n_shards)

    def _combine(self, vals: List[Any], weights: List[int]):
        if len(vals) == 1 and self._reduce != "concat_list":
            return vals[0]
        if self._reduce == "join":
            return " ".join(v for v in vals if v is not None)
        if self._reduce == "first":
            return vals[0]
        total = sum(weights) or 1
        if self._reduce == "weighted_mean":
            if any(v is None for v in vals):
                return None
            return sum(v * w / total for v, w in zip(vals, weights))
        if self._reduce == "weighted_mean_cats":
            out: Dict[str, float] = {}
            for v, w in zip(vals, weights):
                for k, s in v.items():
                    out[k] = out.get(k, 0.0) + s * w / total
            return out
        # concat_list
        return [x for v in vals if v is not None for x in v]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._text_col].to_pylist()
        items = [(t, tokenize(t)) for t in texts]
        results = self._map_and_call(items, self._render)
        col = []
        for (text, tokens), (shards, responses, _prompts) in zip(items, results):
            vals = [self._parse_fn(r) for r in responses]
            weights = [s.tok_end - s.tok_start for s in shards]
            if self._shard_post_fn is not None:
                vals = [
                    self._shard_post_fn(v, w) for v, w in zip(vals, weights)
                ]
            combined = self._combine(vals, weights)
            if self._post_fn is not None:
                combined = self._post_fn(combined, tokens)
            col.append(combined)
        batch = batch.append_column(self._out_col, pa.array(col, type=self._out_type))
        return self._maybe_save_io(batch, results)
