"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship KG pipeline (transcripts -> documents -> NER -> REL ->
  EL -> canonical triples) on the sf0.001-scale synthetic transcript table.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 coverage).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query.

The transcript table (driver input-hint shape) is synthesized
deterministically at import time for the smoke/correctness scale factors —
see spacy_llm_ray/data/transcripts.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from spacy_llm_ray.data import ensure_dataset
from spacy_llm_ray.pipelines.queries import QUERIES

# Generated up front (fast, pure pyarrow) so oracle SQL reading the parquet
# path works regardless of execution order.
ensure_dataset("sf0.001")
ensure_dataset("sf0.01")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from spacy_llm_ray.pipelines.kg import kg_triples_dataset

    return kg_triples_dataset("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
