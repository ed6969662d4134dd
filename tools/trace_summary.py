"""Summarize a jax.profiler chrome trace: top device ops by total time.

Usage: python tools/trace_summary.py <trace_dir_or_json.gz> [--top 30]
(trace dir = the --profile_dir passed to train_step_bench / train CLI)
"""
import argparse
import collections
import glob
import gzip
import json
import os.path as osp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--long", action="store_true",
                    help="print the HLO long_name of each top op")
    args = ap.parse_args()

    path = args.path
    if osp.isdir(path):
        cands = sorted(glob.glob(osp.join(path, "**", "*.trace.json.gz"),
                                 recursive=True))
        assert cands, f"no *.trace.json.gz under {path}"
        path = cands[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d["traceEvents"]

    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n}

    durs = collections.Counter()
    cnt = collections.Counter()
    long_names = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            durs[name] += e.get("dur", 0)
            cnt[name] += 1
            ln = e.get("args", {}).get("long_name")
            if ln and name not in long_names:
                long_names[name] = ln
    total = sum(durs.values())
    print(f"device events total (incl. nesting overlap): {total/1e3:.1f} ms")
    for name, us in durs.most_common(args.top):
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")
        if args.long and name in long_names:
            print(f"            {long_names[name][:220]}")


if __name__ == "__main__":
    main()
