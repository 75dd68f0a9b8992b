"""Nested-JSON flattening — the reference's core contribution, rebuilt.

Reference semantics (``emr_json_parquet_schema_drift_etl.py``):

* ``explode_data`` (:57-61): every top-level ``ArrayType`` column is
  replaced by ``explode_outer`` — sequential ``withColumn`` calls, so
  multiple array columns produce a cross-product of rows; null/empty
  arrays keep the row with a null element.
* ``get_flattened_cols`` (:66-73): recursive struct walk emitting
  dotted leaf paths. The reference passes only the immediate parent as
  the recursion prefix (:69), so depth ≥3 paths are wrong ("a.b.c"
  enumerated as "b.c"); we carry the full prefix (documented
  deviation, SURVEY §7.4).
* ``standardize_col_name`` (:78-84): camelCase the dotted path.
* ``flatten_json`` (:91-95): explode → enumerate → order-preserving
  dedup → one ``select`` of aliases (a single Project node).

Our ``flatten`` is a superset: it iterates explode→expand to a
fixpoint, so arrays nested inside structs and arrays-of-arrays at any
depth are denormalized too. Each pass strictly reduces the maximum
nesting depth, so the loop terminates. ``MapType`` columns pass
through untouched (reference parity — maps are invisible to both the
explode and the struct walk).

Everything here is plan-construction time: pure-Python schema walks
producing ``select``/``explode_outer`` expressions. Zero UDFs, zero
driver-side data movement — at 100 TB the generated plan is a chain of
Generate + Project nodes that Catalyst pushes column pruning through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from ..functions.naming import qcol, standardize_unique


def flattened_paths(schema: StructType, prefix: str = "") -> list[str]:
    """Enumerate dotted leaf paths of a schema, depth-first, in field
    order. Corrected full-prefix version of the reference's
    ``get_flattened_cols`` (:66-73). Arrays and maps are leaves."""
    paths: list[str] = []
    for field in schema.fields:
        full = f"{prefix}.{field.name}" if prefix else field.name
        if isinstance(field.dataType, StructType):
            paths.extend(flattened_paths(field.dataType, full))
        else:
            paths.append(full)
    return paths


def explode_arrays(df: DataFrame) -> DataFrame:
    """One pass of the reference's ``explode_data`` (:57-61): replace
    each top-level array column with ``explode_outer`` of itself.
    Sequential, so N array columns → cross-product of their lengths."""
    for field in df.schema.fields:
        if isinstance(field.dataType, ArrayType):
            df = df.withColumn(field.name, F.explode_outer(qcol(field.name)))
    return df


def expand_structs(df: DataFrame) -> DataFrame:
    """One pass: promote every top-level struct's fields to top-level
    columns literally named ``parent.child`` (order-preserving,
    expanded in place). One ``select`` → one Project node.

    Generated names are disambiguated AGAINST the whole output row
    (r12 review find): a source holding both a struct ``a`` with
    field ``b`` AND a literal top-level key ``"a.b"`` would otherwise
    emit two columns literally named ``a.b`` — ambiguous to every
    later name-based reference and silently collapsed by the final
    rename map."""
    seen = {
        f.name.lower()
        for f in df.schema.fields
        if not isinstance(f.dataType, StructType)
    }
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, StructType):
            for sub in field.dataType.fields:
                base = f"{field.name}.{sub.name}"
                name, n = base, 1
                while name.lower() in seen:
                    n += 1
                    name = f"{base}_{n}"
                seen.add(name.lower())
                cols.append(
                    qcol(field.name).getField(sub.name).alias(name)
                )
        else:
            cols.append(qcol(field.name))
    return df.select(*cols)


def _has_nesting(df: DataFrame) -> tuple[bool, bool]:
    has_array = any(isinstance(f.dataType, ArrayType) for f in df.schema.fields)
    has_struct = any(isinstance(f.dataType, StructType) for f in df.schema.fields)
    return has_array, has_struct


def flatten(df: DataFrame, max_passes: int = 32) -> DataFrame:
    """Fully denormalize: explode arrays and expand structs to a
    fixpoint, then camelCase-rename every column in one final
    projection (the reference's ``flatten_json``, :91-95, extended to
    arbitrary depth).

    Collisions after camelCasing are disambiguated ``_2``, ``_3``, …
    in encounter order (the reference would emit duplicate names).
    """
    for _ in range(max_passes):
        has_array, has_struct = _has_nesting(df)
        if not has_array and not has_struct:
            break
        if has_array:
            df = explode_arrays(df)
        if _has_nesting(df)[1]:
            df = expand_structs(df)
    else:
        # re-check AFTER the loop: the final allowed pass may have
        # fully flattened the schema (flatness is only tested at the
        # top of each iteration, so a for/else raise here would
        # reject an already-flat frame)
        if any(_has_nesting(df)):
            raise ValueError(f"nesting deeper than {max_passes} passes")

    renames = standardize_unique([f.name for f in df.schema.fields])
    return df.select(*[qcol(old).alias(new) for old, new in renames.items()])


def flatten_json(df: DataFrame) -> DataFrame:
    """Reference-named alias for :func:`flatten` (ETL:91-95)."""
    return flatten(df)
