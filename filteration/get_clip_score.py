#!/usr/bin/env python
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from divergen_tpu.pipeline.filteration.cli import clip_score
if __name__ == "__main__":
    raise SystemExit(clip_score())
