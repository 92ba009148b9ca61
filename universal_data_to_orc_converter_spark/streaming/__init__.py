"""Streaming surface — SURVEY.md §2.J.

Batch/stream parity is the design rule: every windowed aggregation is
written once against the DataFrame API and runs identically under
``read`` (batch, DuckDB-checkable) and ``readStream`` (incremental,
covered by tests/test_streaming.py with availableNow triggers).
"""
