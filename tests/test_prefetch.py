"""Device-prefetch iterator tests."""

import numpy as np
import pytest

from nanovs_slam_tpu.data.prefetch import device_prefetch


def test_prefetch_order_and_completeness():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    it = device_prefetch(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
