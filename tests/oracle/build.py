"""Compile the reference cocoeval.cpp into a pybind11 test-oracle module.

pybind11 headers come from torch's bundled copy; the reference sources are
included read-only from /root/reference. The built .so is cached under
/tmp/ref_cocoeval_build and reused across pytest runs.
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

REF_COCOEVAL_DIR = (
    "/root/reference/BSGAL/third_party/CenterNet2/detectron2/layers/csrc/cocoeval"
)
BUILD_DIR = "/tmp/ref_cocoeval_build"


def _pybind_include() -> str:
    import torch

    return os.path.join(os.path.dirname(torch.__file__), "include")


def build_ref_cocoeval() -> str | None:
    """Returns the module directory, or None if the build fails / the
    reference tree is unavailable."""
    if not os.path.exists(os.path.join(REF_COCOEVAL_DIR, "cocoeval.cpp")):
        return None
    os.makedirs(BUILD_DIR, exist_ok=True)
    so = os.path.join(BUILD_DIR, "ref_cocoeval.so")
    if os.path.exists(so):
        return BUILD_DIR
    binding = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_binding.cpp")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        binding,
        os.path.join(REF_COCOEVAL_DIR, "cocoeval.cpp"),
        f"-I{REF_COCOEVAL_DIR}",
        f"-I{_pybind_include()}",
        f"-I{sysconfig.get_paths()['include']}",
        "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        sys.stderr.write(f"ref_cocoeval build failed: {getattr(e, 'stderr', e)}\n")
        return None
    return BUILD_DIR


def load_ref_cocoeval():
    d = build_ref_cocoeval()
    if d is None:
        return None
    if d not in sys.path:
        sys.path.insert(0, d)
    import ref_cocoeval

    return ref_cocoeval
