"""Dataset integrity check (reference: scripts/yolo_data_sanity.py):
find/delete samples missing any of image/mask/label."""

import _bootstrap  # noqa: F401  (repo-root sys.path)
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--delete", action="store_true")
    args = ap.parse_args(argv)

    from flope_tpu.data.yolo_labels import dataset_sanity_check
    from pathlib import Path

    root = Path(args.root)
    subdirs = tuple(f"{s}/{args.split}" for s in ["images", "masks", "labels"])
    bad = dataset_sanity_check(root, subdirs=subdirs, delete=args.delete)
    action = "deleted" if args.delete else "found"
    print(f"{action} {len(bad)} incomplete samples: {bad[:10]}")


if __name__ == "__main__":
    sys.exit(main())
