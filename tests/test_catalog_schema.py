"""Catalog-wide output-schema guard (round-6 verdict item 1).

The correctness driver canonicalizes each query's result with a raw
pandas ``sort_values`` over every column; cells holding Python lists
(Spark ``array<...>``), dicts (``map``) or Rows (``struct``) are
unhashable there and make the row NOT comparable — ``text_hash_embed``
failed exactly this way in round 6 while the local replica passed,
because ``tests/compare.py`` stringifies list cells before sorting
(strictly weaker than the driver).

This test closes the CLASS, not just the instance: every declared
query's output schema must contain only driver-sortable scalar leaf
types.  Serialize vectors as strings (``concat_ws`` /
``array_to_string``) or flatten to one column per element in BOTH
engines before returning.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from python_minerva_etl_spark.queries.catalog import all_queries

_QUERIES = all_queries()

_BANNED = (ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_output_schema_is_driver_sortable(spark, name):
    q = _QUERIES[name]
    schema = q.spark(spark, "/root/testdata/sf0.001").schema
    offenders = [f"{f.name}: {f.dataType.simpleString()}"
                 for f in schema.fields
                 if isinstance(f.dataType, _BANNED)]
    assert not offenders, (
        f"{name} emits non-scalar output columns the driver's pandas "
        f"canonicalizer cannot sort ({offenders}); serialize to string "
        f"or flatten to scalar columns in BOTH the Spark plan and the "
        f"oracle SQL")
