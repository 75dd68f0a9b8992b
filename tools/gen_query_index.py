"""Generate QUERIES.md: one row per queries() entry with its
docstring summary and correctness-check mode. Run after adding
queries; the file is committed so reviewers get a navigable index.

Usage: python tools/gen_query_index.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    lines = [
        "# QUERIES — driver-contract inventory",
        "",
        f"{len(qs)} queries; {len(oracles)} with a DuckDB oracle "
        "(value-hash checked at sf0.01), the rest rows-only "
        "(algorithm-specific or iterative results).",
        "",
        "| # | Query | Check | Summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        doc = (fn.__doc__ or "").strip().split("\n")
        summary = " ".join(part.strip() for part in doc)
        if len(summary) > 160:
            summary = summary[:157] + "..."
        mode = "oracle" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {mode} | {summary} |")
    with open("QUERIES.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries indexed")


if __name__ == "__main__":
    main()
