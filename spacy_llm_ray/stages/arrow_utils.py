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
