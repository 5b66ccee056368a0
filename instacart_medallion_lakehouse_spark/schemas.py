"""Explicit StructType registry.

The reference enforces one explicit schema per CSV source with per-field
nullability (notebooks/01_bronze_ingest.py:36-68); these are reproduced
here verbatim as the ingestion contract, alongside the driver testdata
schemas (FIXTURES.md §B) used by the oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(fields: list[tuple[str, object, bool]]) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# --- Reference Instacart schemas (01_bronze_ingest.py:36-68) ---

ORDERS_SCHEMA = _st(
    [
        ("order_id", IntegerType(), False),
        ("user_id", IntegerType(), False),
        ("eval_set", StringType(), False),
        ("order_number", IntegerType(), False),
        ("order_dow", IntegerType(), False),
        ("order_hour_of_day", IntegerType(), False),
        # Only nullable bronze column: null means first order.
        ("days_since_prior_order", FloatType(), True),
    ]
)

ORDER_PRODUCTS_SCHEMA = _st(
    [
        ("order_id", IntegerType(), False),
        ("product_id", IntegerType(), False),
        ("add_to_cart_order", IntegerType(), False),
        ("reordered", IntegerType(), False),
    ]
)

PRODUCTS_SCHEMA = _st(
    [
        ("product_id", IntegerType(), False),
        ("product_name", StringType(), False),
        ("aisle_id", IntegerType(), False),
        ("department_id", IntegerType(), False),
    ]
)

AISLES_SCHEMA = _st([("aisle_id", IntegerType(), False), ("aisle", StringType(), False)])

DEPARTMENTS_SCHEMA = _st(
    [("department_id", IntegerType(), False), ("department", StringType(), False)]
)

INSTACART_SCHEMAS: dict[str, StructType] = {
    "orders": ORDERS_SCHEMA,
    "order_products": ORDER_PRODUCTS_SCHEMA,
    "products": PRODUCTS_SCHEMA,
    "aisles": AISLES_SCHEMA,
    "departments": DEPARTMENTS_SCHEMA,
}


# --- Driver testdata schemas (FIXTURES.md §B) ---

LINEITEM_SCHEMA = _st(
    [
        ("l_orderkey", LongType(), False),
        ("l_partkey", LongType(), False),
        ("l_suppkey", LongType(), False),
        ("l_linenumber", IntegerType(), False),
        ("l_quantity", DoubleType(), False),
        ("l_extendedprice", DoubleType(), False),
        ("l_discount", DoubleType(), False),
        ("l_tax", DoubleType(), False),
        ("l_returnflag", StringType(), False),
        ("l_linestatus", StringType(), False),
        ("l_shipdate", TimestampType(), False),
    ]
)

TESTDATA_ORDERS_SCHEMA = _st(
    [
        ("o_orderkey", LongType(), False),
        ("o_custkey", LongType(), False),
        ("o_orderstatus", StringType(), False),
        ("o_totalprice", DoubleType(), False),
        ("o_orderdate", TimestampType(), False),
        ("o_orderpriority", StringType(), False),
    ]
)

EVENTS_SCHEMA = _st(
    [
        ("event_id", LongType(), False),
        ("ts", TimestampType(), False),
        ("user_id", LongType(), False),
        ("event_type", StringType(), False),
        ("value", DoubleType(), False),
        ("props", StringType(), True),
    ]
)
