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


def test_batched_stream_identical_to_single():
    """StreamProcessor(batch=N) must yield exactly the single-frame outputs
    (guard-banded stack + per-frame zone masks), including a short tail."""
    engine_small = RaisrEngine(RaisrConfig(filterfolder=FOLDER, passes=1))
    rng = np.random.default_rng(17)
    frames = [
        Frame(
            y=rng.integers(16, 235, (40, 64)).astype(np.uint8),
            u=rng.integers(16, 240, (20, 32)).astype(np.uint8),
            v=rng.integers(16, 240, (20, 32)).astype(np.uint8),
        )
        for _ in range(5)
    ]
    single = list(StreamProcessor(engine_small, depth=1).process(iter(frames)))
    batched = list(
        StreamProcessor(engine_small, depth=1, batch=3).process(iter(frames))
    )
    assert len(batched) == len(single) == 5
    for s, b in zip(single, batched):
        assert np.array_equal(s.y, b.y)
        assert np.array_equal(s.u, b.u)
        assert np.array_equal(s.v, b.v)
