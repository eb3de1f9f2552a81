"""Vectorized (Arrow-batched) pandas UDFs — the engine's only Python
execution surface. No row-at-a-time ``F.udf`` anywhere (north rule:
"no per-row Python"); enforced by tests/test_no_row_udf.py.
"""
