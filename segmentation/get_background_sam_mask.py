#!/usr/bin/env python
"""Entry point parity with DiverGen/segmentation/get_background_sam_mask.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from divergen_tpu.pipeline.segmentation.corner_masks import main

if __name__ == "__main__":
    raise SystemExit(main())
