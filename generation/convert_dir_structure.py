#!/usr/bin/env python
"""Reorganize flat samples/II/{cat_id}_{n:07d}.png into per-category-name
dirs (↔ DiverGen/generation/convert_dir_structure.py:26-139)."""
import argparse
import json
import os
import shutil
import sys
from glob import glob


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--in_dir", required=True, help="flat dir of {cat_id}_{n}.png")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--dataset_json_path", required=True, help="LVIS cat info json")
    p.add_argument("--use_name", action="store_true", help="dir per category name (else id)")
    p.add_argument("--move", action="store_true", help="move instead of copy")
    args = p.parse_args(argv)

    with open(args.dataset_json_path) as f:
        data = json.load(f)
    cats = data["categories"] if isinstance(data, dict) else data
    id2name = {str(c["id"]): c["name"] for c in cats}

    n = 0
    for f in sorted(glob(os.path.join(args.in_dir, "*.png"))):
        base = os.path.basename(f)
        cat_id = base.rsplit("_", 1)[0]
        sub = id2name.get(cat_id, cat_id) if args.use_name else cat_id
        dst = os.path.join(args.out_dir, sub)
        os.makedirs(dst, exist_ok=True)
        (shutil.move if args.move else shutil.copy2)(f, os.path.join(dst, base))
        n += 1
    print(f"organized {n} files into {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
