"""Nested-record reshaping: flatten / pairfy / dictfy as relational ops.

The reference turns nested reference dicts into attribute-value pairs for
the pairwise classifier (/root/reference/code/3_update_duplicateIDs.py:
153-183): ``flatten`` joins nested keys with '_', ``pairfy`` emits
(attr, str(value)) with list elements exploded (lists of dicts recurse
with the parent key), ``dictfy`` groups values back per attribute.

Spark mapping (SURVEY.md §2.8 'flatten/pairfy/dictfy'): a schema-driven
melt — walk the struct schema once at plan time, build one
array<struct<attr,value>> expression per row, explode it. dictfy is one
groupBy/collect_list. Everything stays in whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pair(attr: str, value: Column) -> Column:
    return F.struct(
        F.lit(attr).alias("attr"), value.cast("string").alias("value")
    )


def _leaf_arrays(col: Column, dtype: T.DataType, key: str, parent: str) -> list[Column]:
    """Arrays of (attr, value) pairs for one field, mirroring pairfy:
    scalars → [pair(parent_key)], lists → one pair per element under the
    list's own key, lists of structs recurse with the list key as parent."""
    name = f"{parent}_{key}" if parent else key
    if isinstance(dtype, T.StructType):
        out: list[Column] = []
        for f in dtype.fields:
            out += _leaf_arrays(col[f.name], f.dataType, f.name, name)
        return out
    if isinstance(dtype, T.ArrayType):
        elem = dtype.elementType
        if isinstance(elem, T.StructType):
            # reference pairfy recurses with the LIST key as the parent
            inner: list[Column] = []

            def _per_elem(field):
                # single-arg lambda: F.transform dispatches on arity.
                # _leaf_arrays returns array<struct> columns — flatten the
                # wrapper so every branch yields array<struct> uniformly
                return lambda s: F.flatten(
                    F.array(
                        *_leaf_arrays(s[field.name], field.dataType, field.name, key)
                    )
                )

            for f in elem.fields:
                inner.append(F.flatten(F.transform(col, _per_elem(f))))
            return inner
        return [F.transform(col, lambda v: _pair(name, v))]
    return [F.array(_pair(name, col))]


def melt_attrs(df: DataFrame, id_col: str, record_col: str) -> DataFrame:
    """(id, attr, value): every attribute-value pair of a (nested) struct
    column, flattened with '_' joined keys — flatten+pairfy."""
    dtype = df.schema[record_col].dataType
    if not isinstance(dtype, T.StructType):
        raise ValueError(f"{record_col} must be a struct column")
    arrays: list[Column] = []
    for f in dtype.fields:
        arrays += _leaf_arrays(F.col(record_col)[f.name], f.dataType, f.name, "")
    all_pairs = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    return (
        df.select(F.col(id_col), F.explode(all_pairs).alias("p"))
        .select(id_col, F.col("p.attr").alias("attr"), F.col("p.value").alias("value"))
        .where(F.col("value").isNotNull())
    )


def collect_attrs(melted: DataFrame, id_col: str = "id") -> DataFrame:
    """dictfy: (id, attr, values array) — same key's values appended."""
    return melted.groupBy(id_col, "attr").agg(
        F.collect_list("value").alias("values")
    )
