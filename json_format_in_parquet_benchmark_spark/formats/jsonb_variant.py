"""jsonb: the document parsed once into a self-describing binary form.

Reference: /root/reference/src/format/jsonb.rs (datafuselabs JSONB binary).
Spark 4's ``VariantType`` is the idiomatic equivalent: ``parse_json`` builds
the binary document once; ``variant_get`` then navigates it without
re-parsing (the pre-parsed query arm of benches/query.rs:7-21), and the
Parquet writer stores it as the Variant logical type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import DOC_COL, JsonFormatBase

VARIANT_COL = "v"


class JsonbVariantFormat(JsonFormatBase):
    name = "jsonb"

    def encode(self, raw: DataFrame) -> DataFrame:
        return raw.select(F.parse_json(F.col(DOC_COL)).alias(VARIANT_COL))

    def decode(self, encoded: DataFrame) -> DataFrame:
        return encoded.select(F.to_json(F.col(VARIANT_COL)).alias(DOC_COL))

    @staticmethod
    def get_path(encoded: DataFrame, path: str, dtype: str = "string") -> DataFrame:
        """Path extraction on the pre-parsed binary document (O19)."""
        return encoded.select(
            F.variant_get(F.col(VARIANT_COL), path, dtype).alias("value")
        )
