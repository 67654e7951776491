"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself BEFORE importing this module:
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``       — flagship interleaved-extraction pipeline on the
                      deterministic synthetic corpus sized for sf0.001.
- ``queries()``     — one callable per implemented operator/pipeline
                      (SURVEY.md §2 + training-data operator suite);
                      each takes an sf_dir and returns a Dataset /
                      DataFrame / pyarrow Table.
- ``oracle_sql()``  — DuckDB equivalents for the SQL-expressible subset
                      (identical column names + rounding on both sides).
                      OCR/extraction and sketch-based queries are
                      non-SQL-expressible -> rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: interleaved docs -> explode -> strip ⊕ OCR ->
    reassemble, on the sf0.001-scale synthetic corpus."""
    from tesseract_wasm_ray.pipelines.queries import q_extract_flagship

    return q_extract_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tesseract_wasm_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tesseract_wasm_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
