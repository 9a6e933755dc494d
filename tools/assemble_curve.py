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
# every input must be stamped at ONE clean code commit: mixing points from
# different heads (or a -dirty stamp) is the r9/r10 mixed-stamp hazard one
# level up — the curve would silently blend two codebases
commits = sorted({a.get("commit", "?") for a in arts})
if len(commits) != 1 or any(c.endswith("-dirty") or c == "?" for c in commits):
    raise SystemExit(f"input artifacts are not one clean commit: {commits} "
                     f"(regenerate the stale points at HEAD first)")
base = arts[0]["base"]
points = []
for p, a in zip(inputs, arts):
    # data factor from the corpus dirs: data/sfN vs /root/testdata/sf0.1
    name = a["scale"]["dir"].rstrip("/").split("/")[-1]  # e.g. sf10
    factor = int(round(float(name[2:]) / 0.1))
    points.append((factor, p, a))
points.sort()

# UNION of every point's family keys: taking only the first artifact's
# silently dropped queries benched only at later points
family = sorted(set().union(
    *[a["dedup_ann_cluster_family"].keys() for a in arts]))
curve = {}
for q in family:
    b = base["queries"].get(q)
    # a query benched only at later points (added mid-family) still gets a
    # row — ratios normalize by each point's OWN base, so arts[0]'s base is
    # display-only; dropping the row here was the same silent-drop the
    # family-key union exists to prevent
    if b is None or b <= 0:
        row = {"base_sec_1x": None,
               "note": "absent from the 1x artifact's base run", "ratios": {}}
    else:
        row = {"base_sec_1x": round(b, 2), "ratios": {}}
    for factor, _, a in points:
        s = a["scale"]["queries"].get(q)
        # each artifact's own base timing normalizes its point (same-run
        # pairing controls box-load drift between runs)
        b_own = a["base"]["queries"].get(q)
        # a query that FAILED at either side of a point has an error time,
        # not a wall — publishing it would flatter the curve; null it and
        # say so
        failed = (q in a["scale"].get("failed", []) or
                  q in a["base"].get("failed", []))
        if failed:
            row["ratios"][f"{factor}x"] = None
            row.setdefault("failed_points", []).append(f"{factor}x")
        elif s is not None and b_own:
            row["ratios"][f"{factor}x"] = round(s / b_own, 2)
        # r16: carry the invariant registers (q57/q58 cc_rounds, q108
        # cand_pairs) per point so the curve itself adjudicates its tail —
        # flat rounds + linear candidate mass under a grown wall = load
        regs = {}
        for key in ("cc_rounds", "cand_pairs"):
            bv = a["base"].get(key, {}).get(q)
            sv = a["scale"].get(key, {}).get(q)
            if bv is not None or sv is not None:
                regs[key] = {"base": bv, "scale": sv}
        if regs:
            row.setdefault("registers", {})[f"{factor}x"] = regs
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
