"""Column-name utilities (pure Python, plan-construction time).

Parity target: ``standardize_col_name`` reproduces the reference's
camelCasing of dotted paths
(``emr_json_parquet_schema_drift_etl.py:78-84``): the character after
each ``.`` is uppercased, then dots are removed — ``"a.b.c"`` →
``"aBC"``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def standardize_col_name(col_name: str) -> str:
    """Camel-case a dotted path: ``"location.lat"`` → ``"locationLat"``.

    Byte-for-byte parity with the reference implementation: only the
    single character following a dot is uppercased; everything else is
    preserved verbatim.
    """
    chars = list(col_name)
    for ind, ch in enumerate(chars):
        if ch == "." and ind + 1 < len(chars):
            chars[ind + 1] = chars[ind + 1].upper()
    return "".join(chars).replace(".", "")


def standardize_unique(paths: list[str]) -> dict[str, str]:
    """Map each dotted path to a standardized name, deterministically
    disambiguating collisions (``a.b`` and ``aB`` both camel-case to
    ``aB``) by suffixing ``_2``, ``_3``, … in encounter order.

    The reference would silently produce duplicate columns here
    (SURVEY §7.4 "name collisions"); we make the output schema valid.

    Uniqueness is CASE-INSENSITIVE: Spark's writer rejects duplicate
    columns under the default spark.sql.caseSensitive=false, so two
    names differing only in case ('ab' vs 'aB') would survive a
    case-sensitive dedup here and crash the partitioned write.
    """
    out: dict[str, str] = {}
    taken: set[str] = set()
    for path in paths:
        base = standardize_col_name(path)
        name, n = base, 1
        while name.lower() in taken:
            n += 1
            name = f"{base}_{n}"
        taken.add(name.lower())
        out[path] = name
    return out


def qcol(name: str) -> Column:
    """Reference a column whose *literal* name may contain dots.

    ``F.col("a.b")`` means struct access; flattening produces interim
    columns literally named ``"a.b"``, which need backtick quoting.
    A literal backtick inside the name is ESCAPED by doubling (the
    Spark rule) — stripping it resolved a column named ``a`b`` to the
    unrelated ``ab``, silently reading the wrong data (r12 review
    find).
    """
    return F.col("`" + name.replace("`", "``") + "`")
