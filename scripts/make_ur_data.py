"""Rename robot-capture files to the frame_%05d convention (reference:
scripts/make_ur_data.py)."""

import argparse
import shutil
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--ext", default=None, help="filter by extension")
    args = ap.parse_args(argv)

    src = Path(args.in_dir)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(f for f in src.iterdir() if f.is_file()
                   and (args.ext is None or f.suffix == f".{args.ext}"))
    for i, f in enumerate(files):
        shutil.copy2(f, out / f"frame_{i:05d}{f.suffix}")
    print(f"renamed {len(files)} files into {out}")


if __name__ == "__main__":
    sys.exit(main())
