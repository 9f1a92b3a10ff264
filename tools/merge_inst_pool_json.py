#!/usr/bin/env python
"""Merge instance-pool JSONs with optional path-prefix rewrite
(↔ DiverGen/tools/merge_inst_pool_json.py:60-90)."""
import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--inst_pool_path", nargs="+", required=True)
    p.add_argument("--out_inst_pool_path", required=True)
    p.add_argument("--enable_replace", action="store_true")
    p.add_argument("--before_prefix", nargs="+", default=[])
    p.add_argument("--after_prefix", nargs="+", default=[])
    args = p.parse_args(argv)
    if args.enable_replace:
        assert len(args.inst_pool_path) == len(args.before_prefix) == len(args.after_prefix)

    out = {}
    for i, path in enumerate(args.inst_pool_path):
        with open(path) as f:
            pool = json.load(f)
        for key, value in pool.items():
            if args.enable_replace:
                value = [v.replace(args.before_prefix[i], args.after_prefix[i]) for v in value]
            out.setdefault(key, []).extend(value)
    os.makedirs(os.path.dirname(args.out_inst_pool_path) or ".", exist_ok=True)
    with open(args.out_inst_pool_path, "w") as f:
        json.dump(out, f)
    print(f"merged {len(args.inst_pool_path)} pools → {args.out_inst_pool_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
