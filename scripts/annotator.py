"""Launch the browser pose annotator (reference: pose_annotator/annotator.py).

Edits data/flower_poses.npy over the 3DGS plant point cloud."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--poses", default="data/flower_poses.npy")
    ap.add_argument("--splats", default=None, help="splats.ply for context")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args(argv)

    from flope_tpu.annotator import AnnotatorState, serve

    state = AnnotatorState(args.poses, args.splats)
    serve(state, port=args.port)


if __name__ == "__main__":
    sys.exit(main())
