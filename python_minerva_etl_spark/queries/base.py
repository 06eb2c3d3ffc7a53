"""Declared-query plumbing for the driver contract (SURVEY.md §2).

A :class:`DeclaredQuery` couples a PySpark implementation with its
DuckDB oracle SQL (or ``oracle=None`` for rows-only checks of ops that
are not cleanly SQL-expressible).  Column names are aliased identically
on both sides — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..registry import load_table


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    survey_id: str = ""  # SURVEY.md §2 operator row(s) this query declares
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
