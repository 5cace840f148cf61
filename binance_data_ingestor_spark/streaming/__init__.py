"""Streaming jobs: multiplexed ingestion and native kline aggregation."""
