#!/usr/bin/env python
"""Convert LVIS-category results/annotations to COCO-80 categories
(↔ DiverGen/divergen/evaluation/lvis_to_coco_evaluation.py — cross-dataset
evaluation support). Maps by category name (synonym[0]) where a COCO name
matches an LVIS category; detections of unmapped categories are dropped."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--lvis_json", required=True, help="LVIS categories source")
    p.add_argument("--coco_json", required=True, help="COCO categories target")
    p.add_argument("--results", required=True, help="LVIS-format results json")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    lvis_cats = json.load(open(args.lvis_json))["categories"]
    coco_cats = json.load(open(args.coco_json))["categories"]
    coco_by_name = {c["name"].replace(" ", "_"): c["id"] for c in coco_cats}
    lvis2coco = {}
    for c in lvis_cats:
        names = c.get("synonyms", [c.get("name", "")])
        for n in names:
            if n in coco_by_name:
                lvis2coco[c["id"]] = coco_by_name[n]
                break
    results = json.load(open(args.results))
    out = []
    for r in results:
        cid = lvis2coco.get(r["category_id"])
        if cid is not None:
            out.append(dict(r, category_id=cid))
    json.dump(out, open(args.out, "w"))
    print(f"mapped {len(out)}/{len(results)} detections over {len(lvis2coco)} categories")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
