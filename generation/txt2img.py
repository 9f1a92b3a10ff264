#!/usr/bin/env python
"""Entry point parity with DiverGen/generation/txt2img_diffusers_stages_from_txt.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from divergen_tpu.pipeline.generation.txt2img import main

if __name__ == "__main__":
    raise SystemExit(main())
