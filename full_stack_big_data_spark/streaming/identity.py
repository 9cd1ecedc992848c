"""Identity pipes — the reference's core integration semantics.

Kafka→Storm→Kafka and Kafka→SparkStreaming→Kafka both reduce to
"decode, (count,) re-encode, emit the same records"
(``integration/KafkaStormSpec.scala`` §3.2, ``KafkaSparkStreamingSpec``
§3.3). In Structured Streaming the whole topology is one declarative
pipeline: source → deserialize → serialize → sink, with ``observe()``
supplying the reference's accumulator metrics (A4,
``KafkaSparkStreamingSpec.scala:196-197``) without any custom counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from ..sources.serde import from_json_bytes, to_json_bytes


def identity_pipe_json(stream_df: DataFrame, cols: list[str],
                       schema: StructType, observe: bool = True) -> DataFrame:
    """rows → json bytes → rows; with an observed record counter."""
    encoded = to_json_bytes(stream_df, cols)
    if observe:
        encoded = encoded.observe("identity_metrics", F.count(F.lit(1)).alias("n_records"))
    return from_json_bytes(encoded, schema)
