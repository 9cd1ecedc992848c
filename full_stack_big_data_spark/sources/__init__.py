from .serde import (
    TWEET_AVSC, TWEET_SCHEMA, decode_tweet_avro, encode_tweet_avro,
    from_json_bytes, to_json_bytes, tweet_from_avro_bytes, tweet_to_avro_bytes,
)
from .kafka import kafka_reader, kafka_source_options, write_to_kafka

__all__ = [
    "TWEET_AVSC", "TWEET_SCHEMA", "decode_tweet_avro", "encode_tweet_avro",
    "from_json_bytes", "to_json_bytes", "tweet_from_avro_bytes",
    "tweet_to_avro_bytes", "kafka_reader", "kafka_source_options",
    "write_to_kafka",
]
