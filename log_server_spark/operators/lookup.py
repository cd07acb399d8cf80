"""Point lookup — the reference `get <table> <id>` command (SURVEY.md §3.2).

``get(table, id)`` ≡ filter on the key + orderBy(ts) (F1, O1) with id
coercion (F7: RecordId.parse tries Int first — "123" and 123 are the same
id, RecordId.scala:61-62). Catalyst pushes the equality predicates into the
parquet/Iceberg scan, so file/partition stats do the pruning the reference's
sorted-array header index did; no index code is needed.

Output shape mirrors JsRecord JSON (S8: GetCommand.scala:38-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_id(col):
    """RecordId.parse coercion: numeric strings render as the int."""
    as_int = col.try_cast("int")
    return F.when(as_int.isNotNull(), as_int.cast("string")).otherwise(col)


def get_records(records: DataFrame, table: str, record_id: str | int) -> DataFrame:
    """All stored records for (table, id), timestamp-ascending."""
    from log_server_spark.parse_ref import canonical_record_id

    rid = canonical_record_id(str(record_id))
    return (
        records.filter(
            (F.col("table") == table) & (F.col("record_id") == rid)
        )
        .orderBy("ts_millis")
        .select("table", "record_id", "ts_millis", "text", "url")
    )


def to_json_records(df: DataFrame) -> DataFrame:
    """JSON-shaped output (S8) for an already-filtered record frame."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("table").alias("tableName"),
                F.col("record_id").alias("id"),
                F.col("ts_millis").alias("timestamp"),
                F.col("text").alias("data"),
            )
        ).alias("json")
    )


def get_records_json(records: DataFrame, table: str, record_id: str | int) -> DataFrame:
    """JSON-shaped output (S8): one `json` string column per record."""
    return to_json_records(get_records(records, table, record_id))
