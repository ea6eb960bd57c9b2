"""clean_read_schema directory handling (r3 ADVICE)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spacy_llm_ray.stages.arrow_utils import clean_read_schema


def test_clean_read_schema_recurses_into_partition_subdirs(tmp_path):
    # The _input_units layout writes unit=N/ subdirectories; the schema
    # probe must find parts there instead of IndexError-ing on the root.
    sub = tmp_path / "unit=0"
    sub.mkdir()
    pq.write_table(pa.table({"a": [1], "b": ["x"]}), sub / "part-0.parquet")
    s = clean_read_schema(str(tmp_path))
    assert s.names == ["a", "b"]
    assert s.metadata is None


def test_clean_read_schema_empty_dir_raises_descriptive(tmp_path):
    with pytest.raises(FileNotFoundError, match="no .parquet parts"):
        clean_read_schema(str(tmp_path))


def test_clean_read_schema_column_subset(tmp_path):
    pq.write_table(pa.table({"a": [1], "b": ["x"]}), tmp_path / "p.parquet")
    s = clean_read_schema(str(tmp_path), columns=["b"])
    assert s.names == ["b"]
