"""Collect the r5 hardware queue log into SWEEP_r05.json.

Parses the JSON metric lines that tools/r4_hw_queue.sh appended to its log
(kernel-parity pytest summary + r2_perf_sweep entries) and writes the
round-5 sweep record next to SWEEP_r04.json. Decisions are added by the
round notes after reading the numbers — this tool only transcribes
measurements verbatim (no derived claims).

Usage: python tools/collect_sweep_r5.py [LOG] [--date YYYY-MM-DD]
"""
import argparse
import json
import re
import sys


def parse(log_path: str):
    metrics = {}
    extra = {}
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in d:
                    m = d.pop("metric")
                    metrics[m] = d.get("value", d)
                    rest = {k: v for k, v in d.items() if k != "value"}
                    if rest:
                        extra[m] = rest
            m = re.match(r"(\d+) passed.*in ([\d.]+)s", line)
            if m:
                metrics.setdefault("kernel_parity_tpu", []).append(
                    {"passed": int(m.group(1)), "seconds": float(m.group(2))}
                )
    return metrics, extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="/tmp/r5_hw_queue.log")
    ap.add_argument("--date", required=True,
                    help="measurement date (YYYY-MM-DD); passed explicitly "
                         "so the record never guesses")
    ap.add_argument("--out", default="SWEEP_r05.json")
    args = ap.parse_args()
    metrics, extra = parse(args.log)
    out = {
        "date": args.date,
        "device": "TPU v5 lite (1 chip, axon)",
        "tool": "tools/r4_hw_queue.sh via tools/r2_perf_sweep.py "
                "(percall/differencing methods, see SWEEP_r04 methodology)",
        "measurements": metrics,
        "details": extra,
        "decisions": [],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(metrics)} entries")


if __name__ == "__main__":
    main()
