#!/usr/bin/env python3
"""Assemble the multi-decade family growth curve (SCALE_FAMILY_CURVE.json)
from the per-point SCALE_*_BENCH.json artifacts produced by run_scale.py.

Usage: python3 tools/assemble_curve.py SCALE_sf1_BENCH.json \
           SCALE_sf3_BENCH.json SCALE_sf10_BENCH.json

Each input contributes one (factor, per-query seconds) point; the base
(1x) timings come from the FIRST input's base section. Output: per-family
wall-clock ratios at every point, git-SHA-stamped.
"""
import datetime
import json
import subprocess
import sys

inputs = sys.argv[1:]
arts = [json.load(open(p)) for p in inputs]
base = arts[0]["base"]
points = []
for p, a in zip(inputs, arts):
    # data factor from the corpus dirs: data/sfN vs /root/testdata/sf0.1
    name = a["scale"]["dir"].rstrip("/").split("/")[-1]  # e.g. sf10
    factor = int(round(float(name[2:]) / 0.1))
    points.append((factor, p, a))
points.sort()

family = sorted(arts[0]["dedup_ann_cluster_family"].keys())
curve = {}
for q in family:
    b = base["queries"].get(q)
    if b is None or b <= 0:
        continue
    row = {"base_sec_1x": round(b, 2), "ratios": {}}
    for factor, _, a in points:
        s = a["scale"]["queries"].get(q)
        # each artifact's own base timing normalizes its point (same-run
        # pairing controls box-load drift between runs)
        b_own = a["base"]["queries"].get(q)
        if s is not None and b_own:
            row["ratios"][f"{factor}x"] = round(s / b_own, 2)
    curve[q] = row

commit = subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip()
out = {
    "what": ("family wall-clock growth vs data factor; each point is a "
             "same-run base/scale pair from run_scale.py (probe off, warm "
             "prebuilt artifacts both sides)"),
    "commit": commit,
    "generated_by": "python3 tools/assemble_curve.py " + " ".join(inputs),
    "generated_at": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "points": [{"factor": f, "artifact": p, "reps": a["scale"]["reps"],
                "n_failed": a["scale"]["n_failed"]}
               for f, p, a in points],
    "family_curve": curve,
}
with open("SCALE_FAMILY_CURVE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["points"], indent=1))
for q, row in curve.items():
    print(q, row["ratios"])
