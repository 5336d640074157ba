"""Streaming front-end tests: double-buffered host->device frame feeding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flope_tpu.parallel import FrameFeeder, device_stream, make_mesh


def _batches(n, shape=(4, 8, 8, 3)):
    for i in range(n):
        yield {"rgb": np.full(shape, i, np.uint8),
               "depth": np.full(shape[:-1], i, np.uint16)}


class TestFrameFeeder:
    def test_order_and_device_residency(self):
        got = list(device_stream(_batches(5)))
        assert len(got) == 5
        for i, b in enumerate(got):
            assert isinstance(b["rgb"], jax.Array)
            assert b["rgb"].dtype == jnp.uint8
            assert int(b["rgb"][0, 0, 0, 0]) == i

    def test_mesh_sharded_feeding(self):
        mesh = make_mesh({"stream": 8})
        got = list(device_stream(_batches(3, shape=(8, 4, 4, 3)), target=mesh))
        for b in got:
            sharding = b["rgb"].sharding
            # Leading (frame) axis split over the 8 'stream' devices.
            assert len(sharding.device_set) == 8
            shard_shape = sharding.shard_shape(b["rgb"].shape)
            assert shard_shape[0] == 1

    def test_source_exception_propagates(self):
        def bad():
            yield {"x": np.zeros(2)}
            raise ValueError("sensor died")

        it = device_stream(bad())
        next(it)
        with pytest.raises(ValueError, match="sensor died"):
            list(it)

    def test_close_stops_producer(self):
        feeder = FrameFeeder(_batches(10_000), depth=2)
        it = iter(feeder)
        next(it)
        feeder.close()  # must not hang

    def test_overlap_with_compute(self):
        """Consume through a jitted op — the realistic streaming loop."""
        f = jax.jit(lambda b: jnp.sum(b["rgb"].astype(jnp.float32))
                    + jnp.sum(b["depth"].astype(jnp.float32)))
        total = 0.0
        for b in device_stream(_batches(6), depth=2):
            total += float(f(b))
        per_batch = 4 * 8 * 8 * 3 + 4 * 8 * 8
        assert total == sum(i * per_batch for i in range(6))
