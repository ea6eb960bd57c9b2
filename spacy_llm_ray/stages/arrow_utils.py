"""Arrow block hygiene helpers.

pyarrow's pandas->Arrow conversion (``pa.Table.from_pandas``) attaches a
``b'pandas'`` schema-metadata blob whose nested dict makes ``pa.Schema``
unhashable under pyarrow 16. Ray Data hashes block schemas to deduplicate
them across block metadata; an unhashable schema silently disables that
("Failed to hash the schemas (for deduplication)" warnings from reduce
workers) and measurably slows every downstream shuffle — stripping the
metadata took the flagship distinct-triples groupby from 2.5 s to 0.8 s at
sf0.1. Ray converts *returned* pandas DataFrames with the same metadata
attached, so every UDF that hands a DataFrame back to Ray must route
through these helpers to keep blocks metadata-free.
"""

from __future__ import annotations

import functools

import pyarrow as pa


def clean(table: pa.Table) -> pa.Table:
    """Strip schema metadata (zero-copy)."""
    if table.schema.metadata:
        return table.replace_schema_metadata(None)
    return table


def clean_read_schema(path: str, columns=None) -> pa.Schema:
    """Metadata-free read schema for ``read_parquet(schema=...)``: blocks
    leave the read operator already hashable, so Ray's schema dedup works
    from the first operator on (a post-read strip map fixes downstream
    operators but not the read/split unify itself). ``path`` may be a
    parquet file or a directory of parquet parts (schema of the first part,
    which is uniform for our writers)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # Recurse: the _input_units / partitioned writers lay parts out in
        # unit=N/ (or part=N/) subdirectories; take the lexically first part
        # found anywhere under the root (writers emit a uniform schema).
        first = None
        for root, dirs, files in os.walk(path):
            dirs.sort()
            parts = sorted(f for f in files if f.endswith(".parquet"))
            if parts:
                first = os.path.join(root, parts[0])
                break
        if first is None:
            raise FileNotFoundError(
                f"no .parquet parts found under directory {path!r} "
                "(empty or not a parquet dataset)"
            )
        path = first
    s = pq.read_schema(path).remove_metadata()
    if columns:
        s = pa.schema([s.field(c) for c in columns])
    return s


def list_column_matrix(col, dtype=None):
    """Arrow list/fixed_size_list column -> (n, dim) numpy matrix by
    reshaping the flat values buffer — no ``to_pylist()`` Python hop, no
    per-row object arrays (r3 VERDICT #4). Zero-copy from the Arrow buffer
    when dtypes line up; raises on ragged rows (embedding columns are
    uniform by contract)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float32)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError(
                f"ragged list column (row widths vary, first={dim}) cannot "
                "form a (n, dim) matrix"
            )
    if len(flat) != n * dim:
        raise ValueError(
            f"list column has nulls or irregular layout: {len(flat)} values "
            f"!= {n} rows x {dim}"
        )
    m = flat.reshape(n, dim)
    return m.astype(dtype, copy=False) if dtype is not None else m


def df_table(df) -> pa.Table:
    """pandas DataFrame -> metadata-free Arrow table."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def pandas_udf(fn):
    """Wrap a DataFrame-returning map_groups / map_batches UDF so Ray
    receives a metadata-free Arrow table instead of a DataFrame (whose
    implicit conversion would re-attach the ``b'pandas'`` blob)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        if isinstance(out, pa.Table):
            return clean(out)
        return df_table(out)

    return wrapped
