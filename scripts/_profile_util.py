"""Shared relay-safe timing helpers for the profile_* scripts.

block_until_ready returns early through this environment's remote-execution
relay, so timing fences via a forced host readback of a scalar that depends
on the result; chained dispatches execute in order on the device stream, so
one final fetch fences the whole iteration chain (same discipline as
bench.py).
"""

import time


def fence(x) -> float:
    """Host-readback fence over any pytree of arrays."""
    import jax
    import jax.numpy as jnp
    leaves = jax.tree.leaves(x)
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0]).astype(jnp.float32))


def timeit(fn, *args, iters: int = 10) -> float:
    """ms/iteration: warm twice (compile + steady state), chain `iters`
    dispatches, fence once."""
    fence(fn(*args))
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3
