#!/usr/bin/env python3
"""Regenerate QUERIES.md from the live query registry."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plc_data_etl_pipeline_spark.registry import all_queries  # noqa: E402


def summary(doc: str) -> str:
    first = doc.strip().replace("\n", " ")
    while "  " in first:
        first = first.replace("  ", " ")
    # Sentence-split on ". ", skipping abbreviation periods (citations
    # like "Lee et al. 2022" would otherwise truncate the summary).
    cut = first.find(". ")
    while cut >= 0 and first[:cut].endswith(("et al", "e.g", "i.e", "vs", "arXiv")):
        cut = first.find(". ", cut + 1)
    s = first if cut < 0 else first[: cut + 1]
    return s[:160] + "..." if len(s) > 160 else s


def main() -> None:
    qs = all_queries()
    n_oracle = sum(1 for d in qs.values() if d.oracle is not None)
    rows = [
        f"| `{n}` | {'oracle' if d.oracle is not None else 'rows-only'} "
        f"| {summary(d.doc)} |"
        for n, d in sorted(qs.items())
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"
    )
    with open(out, "w") as f:
        f.write(
            "# Query inventory (generated from the registry)\n\n"
            "Every entry in `__spark_entry__.py:queries()`. 'oracle' = "
            "hash-checked\nagainst DuckDB at sf0.01 by the driver (and "
            "locally at sf0.001/0.01/0.1);\n'rows-only' = engine-specific "
            "internals (LSH/hash/binary/approximate),\ncovered instead by "
            "the pytest invariants listed in SURVEY.md §8.\n\n"
            f"Total: {len(qs)} queries — {n_oracle} oracle-checked, "
            f"{len(qs) - n_oracle} rows-only.\n\n"
            "Regenerate: `python scripts/gen_queries_md.py`\n\n"
            "| query | check | summary |\n|---|---|---|\n"
        )
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out}: {len(qs)} queries, {n_oracle} oracled")


if __name__ == "__main__":
    main()
