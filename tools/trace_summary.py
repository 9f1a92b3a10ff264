"""Summarize a jax.profiler xplane trace: top device ops by self time.

Counterpart of the reference's manual torch-profiler / nsight workflows —
here the trace comes from ``jax.profiler.trace`` (written by
``tools/bench_train_step.py --trace DIR`` or ``PROFILE_START_ITER`` in the
trainer, SURVEY §5) and is parsed straight out of the ``.xplane.pb`` proto
(no TensorBoard UI needed on a headless host).

Usage: python tools/trace_summary.py /tmp/trace_dir [--top 25] [--group]

--group folds XLA fusion names like ``fusion.123`` / ``%convolution.5``
into their base op class so the table reads as "where does the time go by
op kind" instead of one row per HLO instruction.
"""
import argparse
import collections
import glob
import os
import re
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no .xplane.pb under {path}")
    return hits[-1]


_BASE = re.compile(r"^%?([a-zA-Z_\-]+?)[._-]?\d*$")


def base_name(name):
    """'%fusion.123 = f32[...] fusion(...), kind=kOutput, ...' -> fusion.

    Event names are full HLO instruction strings; group by the lhs
    instruction name with the trailing .N uniquifier stripped."""
    lhs = name.split(" = ")[0].strip().lstrip("%")
    m = _BASE.match(lhs.split("/")[-1])
    return m.group(1) if m else lhs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--line_filter", default="XLA Ops",
                    help="only lines whose name EQUALS this (default 'XLA Ops' "
                         "— sync compute; 'XLA Modules' = whole-executable "
                         "walls; 'Async XLA Ops' = overlapped DMA, double-"
                         "counts vs compute). '' = everything")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pb = xplane_pb2.XSpace()
    f = find_xplane(args.path)
    with open(f, "rb") as fh:
        pb.ParseFromString(fh.read())

    # device planes: TPU ops live on planes named like "/device:TPU:0" or
    # "TPU:0"; host python/runtime planes are skipped
    rows = collections.Counter()
    totals = collections.Counter()
    for plane in pb.planes:
        pname = plane.name
        if not any(t in pname for t in ("TPU", "GPU", "device")):
            continue
        if "host" in pname.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if args.line_filter and line.name != args.line_filter:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # -> ms
                key = base_name(name) if args.group else name
                rows[key] += dur
                totals[pname] += dur
    if not rows:
        sys.exit("no device events found (is this a device trace?)")
    grand = sum(rows.values())
    print(f"xplane: {f}")
    for p, t in totals.items():
        print(f"  plane {p}: {t:.2f} ms total")
    print(f"{'ms':>10}  {'%':>5}  op")
    for name, ms in rows.most_common(args.top):
        print(f"{ms:10.2f}  {ms / grand * 100:5.1f}  {name}")


if __name__ == "__main__":
    main()
