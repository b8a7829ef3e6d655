"""Structured Streaming operators: event-time windows + watermarks.

windows.py — tumbling/sliding/session windowed aggregation and
watermarked streaming dedup over the PLC/event stream shape. The same
window expressions run in batch mode (queries/stream_batch.py) where the
DuckDB oracle can check them; the streaming tests (tests/test_streaming.py)
run them with file/rate sources + watermarks and assert convergence to
the batch answer.
"""
