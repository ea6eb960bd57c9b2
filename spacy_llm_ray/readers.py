"""Few-shot example / template / KB-description readers.

Reference semantics:
- ``fewshot_reader`` (/root/reference/spacy_llm/registry/reader.py:22-87):
  read examples from .yml/.yaml/.json/.jsonl with suffix-first, then
  fallback-to-any-format parsing.
- ``file_reader`` (reader.py:8-19): read a file (e.g. a prompt template) as a
  string.
- ``ent_desc_reader_csv`` (/root/reference/spacy_llm/tasks/entity_linker/util.py:83-102):
  two-column ``;``-delimited CSV of entity id -> description.

Few-shot examples are small broadcast side-data: the returned plain lists are
passed into stage constructors (replicated per actor), never turned into a
Dataset.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Any, Dict, List, Union


def file_reader(path: Union[str, Path]) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read().strip()


def _read_yaml(path: Path):
    import yaml

    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f)


def _read_json(path: Path):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _read_jsonl(path: Path):
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


_READERS = {
    ".yml": _read_yaml,
    ".yaml": _read_yaml,
    ".json": _read_json,
    ".jsonl": _read_jsonl,
}


def fewshot_reader(path: Union[str, Path]) -> List[Dict[str, Any]]:
    """Read a few-shot example file; try the suffix-matched format first,
    then fall back to every other known format (reader.py:40-70)."""
    path = Path(path)
    readers = list(_READERS.items())
    readers.sort(key=lambda kv: kv[0] != path.suffix)  # suffix match first
    last_err: Exception | None = None
    for _suffix, reader in readers:
        try:
            data = reader(path)
            if data is None:
                continue
            if isinstance(data, dict):
                data = [data]
            if isinstance(data, list):
                return data
        except Exception as err:  # noqa: BLE001 — format fallback by design
            last_err = err
    raise ValueError(
        f"Cannot parse examples from {path} with any supported format "
        f"(.yml/.yaml/.json/.jsonl)"
    ) from last_err


def ent_desc_reader_csv(path: Union[str, Path]) -> Dict[str, str]:
    """Entity descriptions from ``id;description`` CSV; malformed rows are
    skipped; an empty result raises (entity_linker/util.py:95-100)."""
    descs: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for row in csv.reader(f, quoting=csv.QUOTE_ALL, delimiter=";"):
            if len(row) != 2:
                continue
            descs[row[0]] = row[1]
    if not descs:
        raise ValueError(
            "Format of CSV file with entity descriptions is wrong. CSV has to "
            "be formatted as semicolon-delimited CSV with two columns: entity "
            "ID, then description."
        )
    return descs
