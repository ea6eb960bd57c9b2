"""spacy_llm_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
explosion/spacy-llm (reference at /root/reference, cited per-module as
file:line) on top of ray.data.Dataset pipelines:

- transcripts (conv_id, turn_idx, role, text, tool, ts) are assembled into
  turn-ordered documents via a salted groupby(conv_id) shuffle,
- NER / REL / EntityLinker stages run as stateful ``map_batches`` actor pools
  over Arrow batches (prompt render -> model call -> response parse fused in
  one stage, sharding included),
- triples are canonicalized (connected components over surface equivalence +
  linked KB ids, deterministic min-id merge) and materialized as partitioned
  Parquet with per-partition lineage for exactly-once resume.

The package deliberately separates:
- ``spacy_llm_ray.tasks``: pure-Python codecs (prompt builders + response
  parsers) replicating the reference's parsing semantics bit-for-bit,
- ``spacy_llm_ray.stages``: Ray Data stages (map_batches callables),
- ``spacy_llm_ray.pipelines``: end-to-end composed Dataset plans.
"""

__version__ = "0.1.0"

from .tokenizer import Token, Span, tokenize, char_span, filter_spans  # noqa: F401
from .parsing import find_substrings, unique  # noqa: F401
from .normalizers import lowercase_normalizer, strip_normalizer  # noqa: F401

from .cfg_loader import assemble, build_pipeline, load_cfg  # noqa: E402,F401
