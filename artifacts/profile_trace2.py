"""Print individual device slices with args to identify the hot fusions.

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_trace2.py
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

files = glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items() if "TPU" in n}

slices = [e for e in events
          if e.get("ph") == "X" and e.get("pid") in dev_pids
          and not e.get("name", "").startswith("jit_")]
# dedupe across the 3 steps: aggregate by exact name
agg = defaultdict(float)
cnt = defaultdict(int)
args_by_name = {}
for e in slices:
    agg[e["name"]] += e.get("dur", 0) / 1e3
    cnt[e["name"]] += 1
    if e.get("args"):
        args_by_name[e["name"]] = e["args"]

top = sorted(agg, key=agg.get, reverse=True)[:25]
for k in top:
    a = args_by_name.get(k, {})
    extra = {kk: str(vv)[:120] for kk, vv in a.items()
             if kk in ("long_name", "tf_op", "shape", "layout",
                       "memory_bandwidth", "bytes accessed", "source")}
    print(f"{agg[k]/3:8.3f} ms/step x{cnt[k]//3:<3d} {k}")
    for kk, vv in extra.items():
        print(f"          {kk}: {vv}")
