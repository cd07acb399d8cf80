"""Enrichment stage — broadcast hash joins against small lookup dims.

The reference has no relational join (SURVEY.md §2.3); the north_rule adds
lookup enrichment (J3). Both lookup tables are tiny (≤ thousands of rows) so
they are explicitly broadcast: at 1000 executors this is a map-side join with
zero shuffle of the 100 TB fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(records: DataFrame, lang_lookup: DataFrame, domain_lookup: DataFrame) -> DataFrame:
    """Left-join lang + domain dims (rows with unknown keys keep NULL dims)."""
    return records.join(
        F.broadcast(lang_lookup.select("lang", "lang_name", "lang_family")),
        on="lang",
        how="left",
    ).join(
        F.broadcast(
            domain_lookup.select("domain", "category", "country", "is_error_prone")
        ),
        on="domain",
        how="left",
    )
