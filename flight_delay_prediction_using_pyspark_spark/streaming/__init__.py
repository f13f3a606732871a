"""Structured Streaming operators (SURVEY.md §7 extension).

The reference is batch-only; these expose the event-stream
capabilities a production pipeline needs: file-source streams,
watermarked tumbling/session windows, and a custom stateful operator
via applyInPandasWithState. See ops.py.
"""
