"""The codec abstraction, re-expressed for DataFrames.

The reference's `JsonCodec` trait (/root/reference/src/codec.rs:21-33) is
stateful: encode() fills a Vec, flush() writes it, load() refills it.  The
Spark-first equivalent is stateless -- every method is a pure DataFrame
transformation and the "state" is the DataFrame itself:

  encode : raw-line DataFrame (column `doc` string) -> representation DF
  decode : representation DF -> canonical JSON text DF (column `doc`)
  flush  : representation DF -> Parquet (ZSTD), partitioned by Spark
  load   : Parquet -> representation DF

Deliberate departures from the reference, for scale:
- flush writes one file per partition and lets Parquet manage row groups;
  the reference's single-RecordBatch/single-row-group layout
  (plain_json.rs:43 etc.) caps a dataset at one writer thread and one
  reader thread -- an anti-pattern at 100 TB (SURVEY.md section 4).
- encode is pure (the reference's plain_json::encode appends to previous
  state across calls, plain_json.rs:22-26 -- a bench-loop bug we do not
  reproduce).
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession

DOC_COL = "doc"


class JsonFormatBase(abc.ABC):
    """One JSON physical representation with a full encode/decode/flush/load
    cycle (O2-O17 in SURVEY.md section 2.1)."""

    name: str = "base"

    @abc.abstractmethod
    def encode(self, raw: DataFrame) -> DataFrame:
        """Raw NDJSON lines (column ``doc`` string) -> representation."""

    @abc.abstractmethod
    def decode(self, encoded: DataFrame) -> DataFrame:
        """Representation -> JSON text (column ``doc`` string).

        Canonicalization (key order, float formatting) may differ from the
        input byte-for-byte, as it does between the reference's serde/jsonb
        paths; round-trip tests compare re-parsed semantics.
        """

    def flush(self, encoded: DataFrame, path: str) -> None:
        """Write the representation to Parquet with ZSTD (matching the
        reference's writer choice, plain_json.rs:37-44)."""
        encoded.write.mode("overwrite").parquet(path, compression="zstd")

    def load(self, spark: SparkSession, path: str) -> DataFrame:
        """Read the representation back (column types round-trip through
        Spark's vectorized Parquet reader)."""
        return spark.read.parquet(path)
