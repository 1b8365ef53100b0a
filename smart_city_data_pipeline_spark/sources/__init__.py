"""Sources & sinks: parquet lake, hour-partitioned JSONL collector lake,
CSV, and gated JDBC/Kafka connectors."""
