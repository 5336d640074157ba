"""Device-mesh parallelism: stream/data/model axes over ICI via GSPMD."""

from flope_tpu.parallel.mesh import (
    make_mesh,
    stream_sharding,
    replicated,
    shard_batch,
    P,
)
from flope_tpu.parallel.streaming import FrameFeeder, device_stream
