"""Explicit schemas for the engine's domain tables.

The reference declares warehouse numerics as VARCHAR(100) (reference:
postgresql/db-setup/setup.sql:5-10 stores ``demand`` as VARCHAR;
mnt/dags/02datalake_to_datawarehouse.py:232-237 stores the *computed*
``demand_kg`` as VARCHAR too) and lets pandas ``read_csv`` re-infer
types in flight. This engine fixes that deliberately (SURVEY.md §1.3):
explicit StructType everywhere, DoubleType for quantities, DateType for
partition dates. ``CAST(string AS double)`` stays available as an
operator (``cast_numeric``) because *source* data may arrive
string-typed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Source table: dbo.table_product_demand
# (reference: postgresql/db-setup/setup.sql:5-10; domain README.md:72-82)
PRODUCT_DEMAND = T.StructType(
    [
        T.StructField("shop_id", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("product_name", T.StringType(), False),  # cheap|medium|expensive
        T.StructField("demand", T.DoubleType(), True),
    ]
)

# String-typed variant exercising the ingest cast policy
# (reference: mnt/dags/unused_pipeline_sourcecode.py:43 CAST(demand AS NUMERIC)).
PRODUCT_DEMAND_RAW = T.StructType(
    [
        T.StructField("shop_id", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("demand", T.StringType(), True),
    ]
)

# Warehouse table: dbo.table_material_demand
# (reference: mnt/dags/02datalake_to_datawarehouse.py:228-240)
MATERIAL_DEMAND = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("shop_id", T.StringType(), False),
        T.StructField("raw_material", T.StringType(), False),
        T.StructField("demand_kg", T.DoubleType(), True),
    ]
)

# CDC target: dbo.table_online_retail_origin
# (reference: mnt/dags/unused_01retail_origin.py:78-90)
RETAIL_ORIGIN = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("invoice", T.StringType(), True),
        T.StructField("stockcode", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("invoicedate", T.TimestampType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

# CDC change batch: origin schema + operation char(1) in {'I','U','D'}
# (reference: mnt/dags/unused_02retail_stage.py:78-91, composite PK (id,last_updated))
RETAIL_STAGE = T.StructType(
    list(RETAIL_ORIGIN.fields) + [T.StructField("operation", T.StringType(), False)]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (engine extension, SURVEY.md §2.11 / north-star mandate).
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
