"""Join a profiler trace with an HLO dump: per-op device time attributed to
Python source lines (fusion names are opaque; HLO metadata is not).

Usage: python tools/attr_profile.py <trace_dir> <hlo.txt> [reps]
"""

import glob
import gzip
import json
import re
import sys


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    # op name -> (source_file:line, op_kind) from the HLO dump
    rx = re.compile(
        r"%(\S+?) = \S+ (\w+)\(.*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*?source_line=(\d+))?")
    src = {}
    with open(hlo_path) as fh:
        for line in fh:
            m = rx.search(line)
            if not m:
                continue
            name, kind, op_name, sfile, sline = m.groups()
            tag = f"{(sfile or '?').split('/')[-1]}:{sline or '?'}"
            # drop the scan-unroll suffix noise in op_name; keep the module path
            mod = re.sub(r"jit\(<lambda>\)/closed_call/", "", op_name)
            src[name] = (tag, mod)

    tj = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[0]
    with gzip.open(tj, "rt") as fh:
        trace = json.load(fh)
    meta = [e for e in trace.get("traceEvents", []) if e.get("ph") == "M"]
    dev_pids = {e.get("pid") for e in meta
                if e.get("name") == "process_name"
                and str(e.get("args", {}).get("name", "")).startswith("/device:")}
    op_tids = {(e.get("pid"), e.get("tid")) for e in meta
               if e.get("name") == "thread_name" and e.get("pid") in dev_pids
               and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")
              and (e.get("pid"), e.get("tid")) in op_tids]

    by_line = {}
    unattributed = 0
    for e in events:
        name = e["name"]
        hit = src.get(name)
        if hit is None:
            unattributed += e["dur"]
            key = ("<no-hlo-match>", name.split(".")[0])
        else:
            tag, mod = hit
            # strip trailing per-block indices for grouping
            mod_short = re.sub(r"\d+", "#", mod)
            key = (tag, mod_short[:80])
        d = by_line.setdefault(key, [0, 0])
        d[0] += e["dur"]
        d[1] += 1

    total = sum(v[0] for v in by_line.values())
    print(f"total {total/1e3/reps:.1f} ms/call; "
          f"unmatched {unattributed/1e3/reps:.1f} ms/call")
    rows = sorted(by_line.items(), key=lambda kv: -kv[1][0])
    for (tag, mod), (dur, cnt) in rows[:40]:
        print(f"{dur/1e3/reps:9.2f} ms/call x{cnt//reps:5d}  {tag:34s} {mod}")


if __name__ == "__main__":
    main()
