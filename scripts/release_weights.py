"""Pack a trained checkpoint into the single-file npz release format.

Training writes orbax run dirs (params + opt state + step — SURVEY.md §5.4);
deployment needs only the inference variables, and the hosting environment
is wiped between rounds, so deployed weights must live in git. This packs
`params` + `batch_stats` from any loadable checkpoint (orbax run dir or
leaf, torch .pth, or an existing npz) into one compressed bf16 npz under
weights_release/, carrying the training meta sidecar along so loaders keep
warning on config mismatches (e.g. crop-size, width_mult).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax run dir / leaf dir / .pth / .npz")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--meta", nargs="*", default=[],
                    help="extra meta key=value pairs (values parsed as "
                         "JSON when possible)")
    args = ap.parse_args(argv)

    from flope_tpu.utils.runtime import setup_jax
    setup_jax(cpu=True)  # packing is host-side; never touch the chip

    from flope_tpu.utils.checkpoint import (load_posenet_ckpt, read_ckpt_meta,
                                            save_npz_ckpt)

    variables = load_posenet_ckpt(args.ckpt)
    meta = read_ckpt_meta(args.ckpt) or {}
    import json
    for kv in args.meta:
        k, _, v = kv.partition("=")
        try:
            meta[k] = json.loads(v)
        except json.JSONDecodeError:
            meta[k] = v
    save_npz_ckpt(args.out, variables, **meta)
    sz = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({sz:.1f} MB) meta={meta}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
