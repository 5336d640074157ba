"""PoseNet throughput sweep on the current backend (TPU by default).

Writes incremental results to --out as JSONL. Uses the relay-safe fence
(scalar readback) and the persistent compile cache.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="perf_sweep.jsonl")
    ap.add_argument("--configs", default="512x64,512x128,256x256,224x256,128x512")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from flope_tpu.models import PoseNet, init_posenet

    for spec in args.configs.split(","):
        size, batch = (int(v) for v in spec.split("x"))
        t0 = time.time()
        model, v = init_posenet(jax.random.PRNGKey(0), image_size=size,
                                dtype=jnp.bfloat16)
        f = jax.jit(lambda v, x: PoseNet.to_rotmats(
            model.apply(v, x, train=False)).sum())
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (batch, size, size, 3)).astype(np.float32))
        float(f(v, x))
        compile_s = time.time() - t0
        float(f(v, x))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = f(v, x)
        float(out)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"size": size, "batch": batch, "ms": round(dt * 1e3, 2),
               "crops_per_s": round(batch / dt, 1),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as fp:
            fp.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    sys.exit(main())
