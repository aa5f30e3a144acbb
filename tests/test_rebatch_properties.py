"""Property tests for the Stage rebatcher (reference batching invariant:
process_data sees exactly stage_batch_size rows; remainder flushed
last — reference test_batching.py asserts the same)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cosmos_xenna_spark.operators.stage import _rebatch


@st.composite
def batch_streams(draw):
    sizes = draw(st.lists(st.integers(min_value=0, max_value=37), max_size=12))
    return [pd.DataFrame({"x": range(n)}) for n in sizes]


@given(batches=batch_streams(), size=st.integers(min_value=1, max_value=50))
@settings(max_examples=200, deadline=None)
def test_rebatch_exact_sizes_and_order(batches, size):
    total = sum(len(b) for b in batches)
    flat = [x for b in batches for x in b["x"]]
    out = list(_rebatch(iter(batches), size))
    # every chunk except the last is exactly `size`; the last is the remainder
    assert [len(o) for o in out[:-1]] == [size] * max(0, len(out) - 1)
    if total:
        assert 1 <= len(out[-1]) <= size
    assert sum(len(o) for o in out) == total
    # row order is preserved across re-chunking
    assert [x for o in out for x in o["x"]] == flat


@given(batches=batch_streams())
@settings(max_examples=50, deadline=None)
def test_rebatch_none_passthrough(batches):
    out = list(_rebatch(iter(batches), None))
    assert [len(o) for o in out] == [len(b) for b in batches]
