#!/usr/bin/env python
"""Per-category prompt files (↔ DiverGen/tools/generate_prompt.py:21-25:
"a photo of a single {name}, {def}, in a white background")."""
import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--in_json_path", required=True, help="LVIS cat-info json")
    p.add_argument("--out_txt_dir", required=True)
    args = p.parse_args(argv)
    os.makedirs(args.out_txt_dir, exist_ok=True)
    with open(args.in_json_path) as f:
        categories = json.load(f)
    if isinstance(categories, dict):
        categories = categories["categories"]
    for cat in categories:
        with open(os.path.join(args.out_txt_dir, f"{cat['id']}.txt"), "w") as f:
            f.write(
                "a photo of a single {}, {}, in a white background\n".format(
                    cat["name"].replace("_", " "), cat.get("def", "")
                )
            )
    print(f"wrote {len(categories)} prompt files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
