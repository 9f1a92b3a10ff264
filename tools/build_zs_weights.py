#!/usr/bin/env python
"""Build zero-shot classifier weights from CLIP text embeddings of category
names (↔ the reference's CLIP vocabulary embedding helper in
divergen/predictor.py and the zs_weight .npy files Detic-style configs
load). Output: (num_classes, zs_dim) L2-normalized .npy — the reference's
on-disk layout (zero_shot_classifier.py:38-41 transposes on load, as does
modeling.meta_arch.rcnn.load_zs_weight here)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cat_json", required=True, help="LVIS categories json")
    p.add_argument("--out", required=True)
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--model_name", default="ViT-L/14")
    p.add_argument("--bpe_path", default="")
    p.add_argument("--prompt", default="a {}")
    args = p.parse_args(argv)

    from divergen_tpu.modeling.text.tokenizer import SimpleTokenizer
    from divergen_tpu.pipeline.filteration.core import ClipEncoder

    with open(args.cat_json) as f:
        data = json.load(f)
    cats = sorted(data["categories"] if isinstance(data, dict) else data, key=lambda c: c["id"])
    names = [c.get("synonyms", [c.get("name", "")])[0].replace("_", " ") for c in cats]

    params = None
    if args.clip_ckpt:
        from divergen_tpu.utils.torch_weights import load_clip_params

        params = load_clip_params(args.clip_ckpt, args.model_name)
    enc = ClipEncoder(args.model_name, batch=64, params=params)
    tok = SimpleTokenizer(bpe_path=args.bpe_path) if args.bpe_path else SimpleTokenizer(merges=[])
    prompts = [args.prompt.format(n) for n in names]
    feats = []
    for ofs in range(0, len(prompts), 64):
        feats.append(enc.encode_texts(tok.tokenize(prompts[ofs : ofs + 64])))
    w = np.concatenate(feats)  # (C, zs_dim): reference on-disk layout
    np.save(args.out, w.astype(np.float32))
    print(f"zs weights {w.shape} → {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
