"""Device mesh + sharding helpers: the framework's scale-out substrate.

The reference has no distributed capability at all (SURVEY.md §2.4); this is
the new first-class component. Axis conventions:

* ``stream`` — camera streams / frames: the primary data-parallel axis for
  inference (BASELINE.json config 5: 16+ camera streams over a v5e pod).
* ``data``  — training batch data parallelism.
* ``model`` — tensor parallelism for wide layers (PoseNet's 2048-d head;
  ResNet-18 fits one chip, but the rules make TP expressible for bigger
  backbones, as SURVEY.md §2.4 prescribes).

All collectives are XLA-inserted (GSPMD) from NamedSharding annotations —
gradients psum over ``data``, activations all-gather over ``model`` — and ride
ICI within a slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "stream_sharding", "replicated", "shard_batch", "P"]


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh from {axis_name: size}. Defaults to all devices on one
    'stream' axis. Sizes must multiply to the device count used."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"stream": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, names)


def stream_sharding(mesh: Mesh, axis: str = "stream") -> NamedSharding:
    """Shard the leading (frame/stream) axis of a batch across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "stream"):
    """Device-put a host pytree with its leading axis sharded over `axis`."""
    sh = stream_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
