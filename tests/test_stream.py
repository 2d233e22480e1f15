"""Streaming pipeline tests."""

import numpy as np

from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import RaisrEngine, Frame
from raisr_tpu.stream import StreamProcessor

FOLDER = "/root/reference/filters_2x/filters_lowres"


def test_stream_matches_sync():
    rng = np.random.default_rng(0)
    engine = RaisrEngine(RaisrConfig(filterfolder=FOLDER))
    frames = [
        Frame(
            y=rng.integers(16, 235, (24, 32)).astype(np.uint8),
            u=rng.integers(16, 240, (12, 16)).astype(np.uint8),
            v=rng.integers(16, 240, (12, 16)).astype(np.uint8),
        )
        for _ in range(5)
    ]
    sync = [engine.process(f) for f in frames]
    streamed = list(StreamProcessor(engine, depth=3).process(iter(frames)))
    assert len(streamed) == 5
    for a, b in zip(streamed, sync):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)
