"""Connector operator layer (reference ``connectors/kafka/operators.py``
and ``serde.py``): serialization/deserialization with ok/err split
streams, over the raw key/value bytes of Kafka-shaped streams."""

from bytewax_spark.connectors import kafka_log, registry, serde

__all__ = ["serde", "registry", "kafka_log"]
