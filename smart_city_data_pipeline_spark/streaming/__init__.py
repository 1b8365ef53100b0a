"""Structured Streaming operators: watermark window aggs, stateful
congestion-streak detection, stream→partitioned-lake sink."""
