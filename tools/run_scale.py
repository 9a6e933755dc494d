#!/usr/bin/env python3
"""One-command, re-runnable scale gate (SURVEY §12 runbook).

Generates (optionally) a ScaleGen corpus, runs the full Verify + DuckDB
oracle at that scale, benches base-vs-scale back-to-back, and writes
git-SHA-stamped SCALE_* artifacts so every round can regenerate the scale
evidence at HEAD instead of trusting a hand-run.

Examples:
  # the standing sf1 (10x) gate: full 153-query oracle + 3-rep bench
  python3 tools/run_scale.py --scale-dir data/sf1 --out-prefix SCALE_sf1

  # the sf10 (100x) point: generate, spot-check an oracle subset, bench
  # the dedup/ANN/cluster family + TPC-H shapes, single rep
  python3 tools/run_scale.py --scale-dir data/sf10 --factor 100 --gen \
      --reps 1 --out-prefix SCALE_sf10 \
      --verify-queries "$(python3 tools/run_scale.py --print-family)" \
      --bench-queries  "$(python3 tools/run_scale.py --print-family)"

Artifacts: <out-prefix>_CORRECTNESS.json, <out-prefix>_BENCH.json, both
carrying {commit, generated_by, generated_at}.
"""
import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys

# the dedup/ANN/cluster family + TPC-H shapes tracked round-over-round in
# SURVEY §12's growth table
FAMILY = [
    "q22_exact_dup_groups", "q24_minhash_pairs", "q41_embedding_dups",
    "q57_dup_clusters", "q58_dup_clusters_lsh", "q62_semantic_dedup",
    "q81_duplicated_spans", "q105_dedup_inflation", "q108_containment",
    "q51_exact_nn", "q52_ivf_topk", "q27_lsh_topk", "q106_error_proximity",
    "q152_ivf_partial_probe", "q154_incremental_embedding",
    "q158_int8_quant_recall", "q160_pq_adc_recall", "q161_ivfpq_topk",
    "q162_pq_trained_audit", "q163_ivfpq_rerank", "q164_filtered_ann",
    "q165_tombstoned_ann", "q166_grown_ann", "q167_upsert_ann",
    "q168_hybrid_rrf", "q169_grown_minhash", "q170_grown_tombstoned",
    "q171_grown_filtered_ann", "q172_grown_hybrid_rrf",
    # TPC-H shapes: the classic join/agg plans must grow sublinearly too
    "q01_pricing_summary", "q13_revenue_nation", "q141_trade_flows",
    "q143_small_order_revenue", "q148_market_share", "q150_order_priority",
]

# the sf10 ORACLE subset (r11, judge ask #3): FAMILY minus the two
# O(n²)-oracle queries (q51 brute-force NN — ~2.3 h of DuckDB at 200k
# vectors; q154 increment×corpus cosine — same class), plus the
# release-gate, decontamination, streaming, and representative join/agg
# families, all of whose oracles are linear(ish) at 100×. The streaming
# entries are the ones whose sinks the r11 100× run hardened (q109 OOM'd
# the old complete-mode memory sink; q114 was the same latent shape).
SF10_SUBSET = [q for q in FAMILY if q not in
               ("q51_exact_nn", "q154_incremental_embedding")] + [
    "q35_stream_window", "q42_profile", "q48_stream_append",
    "q59_decontaminate", "q63_stream_dedup", "q64_incremental_exact",
    "q65_incremental_minhash", "q67_release_funnel", "q68_data_card",
    "q71_stream_join", "q74_incremental_stored", "q76_decontaminate_spans",
    "q82_stream_incremental_dedup", "q96_stream_release_admission",
    "q107_locf_backfill", "q109_stream_sessions", "q113_salted_fact_join",
    "q114_stream_locf", "q122_monthly_yoy", "q136_revenue_concentration",
    "q147_adaptive_skew_join", "q155_jpeg_decode", "q156_gif_decode",
    "q157_g711_decode",
]


def sh(cmd, env=None, check=True):
    print("[scale] $ " + " ".join(cmd), flush=True)
    e = dict(os.environ)
    e.update(env or {})
    subprocess.run(cmd, check=check, env=e)


def stamp(argv):
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    # the dirty check must EXCLUDE the artifacts this tool itself writes:
    # regenerating point 1 of a multi-point curve would otherwise make
    # points 2..n stamp as "-dirty" even though the CODE is clean (the
    # exact r9/r10 mixed-stamp failure the curve of record suffered)
    dirty = subprocess.run(
        ["git", "diff", "--quiet", "HEAD", "--", ".",
         ":(exclude)SCALE_sf1_CORRECTNESS.json",
         ":(exclude)SCALE_sf1_BENCH.json",
         ":(exclude)SCALE_sf3_CORRECTNESS.json",
         ":(exclude)SCALE_sf3_BENCH.json",
         ":(exclude)SCALE_sf10_CORRECTNESS.json",
         ":(exclude)SCALE_sf10_BENCH.json",
         ":(exclude)SCALE_FAMILY_CURVE.json",
         ":(exclude)bench_detail.json"]).returncode != 0
    return {
        "commit": commit + ("-dirty" if dirty else ""),
        "generated_by": "python3 tools/run_scale.py " + " ".join(argv),
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
    }


def bench(sf_dir, reps, cpus, queries):
    env = {
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": cpus,
        "SPARK_GRAFT_BENCH_REPS": str(reps),
        "SPARK_GRAFT_SCALE_PROBE": "0",  # real scaled data IS the probe
    }
    if queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = queries
    sh(["sbt", "-batch", "runMain graft.Bench"], env=env)
    with open("bench_detail.json") as f:
        return json.load(f)


def section(detail):
    return {
        "dir": detail["sf"],
        "total_sec": round(detail["value"], 2),
        "n_queries": len(detail["queries"]),
        "n_failed": len(detail["failed"]),
        "failed": detail["failed"],
        "warehouse_warm": detail["warehouse_warm"],
        "prebuild_sec": round(detail["prebuild_sec"], 2),
        "reps": detail["reps"],
        "queries": {k: round(v, 3) for k, v in sorted(detail["queries"].items())},
        # r16 (judge ask #2): the invariant registers ride IN the stamped
        # artifacts — q57/q58 propagation rounds and q108 prefix-filter
        # candidate mass per point — so a probe-ratio flag at any scale is
        # adjudicable from the artifact alone (rounds grew / counts grew
        # super-linearly = real regression; flat registers = box load)
        "cc_rounds": detail.get("cc_rounds", {}),
        "cand_pairs": detail.get("cand_pairs", {}),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scale-dir", default=None)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--gen", action="store_true",
                    help="run ScaleGen first (skipped if MANIFEST exists)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--bench-queries", default="",
                    help="csv filter for the timed bench (empty = all)")
    ap.add_argument("--verify-queries", default="",
                    help="csv filter for Verify/oracle (empty = all)")
    ap.add_argument("--subset", default="q51_exact_nn=query_id",
                    help="check_oracle --subset spec (documented sample gates)")
    ap.add_argument("--out-prefix", default=None)
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--print-family", action="store_true",
                    help="print the family query list (for shell substitution)")
    ap.add_argument("--print-sf10-subset", action="store_true",
                    help="print the sf10 oracle-subset query list")
    a = ap.parse_args()
    if a.print_family:
        print(",".join(FAMILY))
        return
    if a.print_sf10_subset:
        print(",".join(SF10_SUBSET))
        return
    if not a.scale_dir or not a.out_prefix:
        ap.error("--scale-dir and --out-prefix are required")

    st = stamp(sys.argv[1:])
    oracle_failed = False

    if a.gen and not os.path.exists(os.path.join(a.scale_dir, "MANIFEST.json")):
        sh(["sbt", "-batch",
            f"Test/runMain graft.devtools.ScaleGen {a.base} {a.scale_dir} "
            f"{a.factor}"])

    if not a.skip_verify:
        out = f"/tmp/verify_scale_{os.path.basename(a.out_prefix)}"
        shutil.rmtree(out, ignore_errors=True)
        vq = f" {a.verify_queries}" if a.verify_queries else ""
        sh(["sbt", "-batch",
            f"runMain graft.Verify {a.scale_dir} {out}{vq}"])
        cj = f"{a.out_prefix}_CORRECTNESS.json"
        # check_oracle exits non-zero when any query fails; the artifact
        # still records every per-query status, so stamp it either way —
        # a crash here would leave an unstamped raw file AND skip the
        # bench (the r9 first-sf10-run failure mode)
        sh(["python3", "tools/check_oracle.py", a.scale_dir, out,
            "--subset", a.subset, "--json", cj], check=False)
        with open(cj) as f:
            art = json.load(f)
        # queries filtered out of a subset Verify run read as "no spark
        # output" — drop them from the artifact, they were not checked
        if a.verify_queries:
            keep = set(q.strip() for q in a.verify_queries.split(",")
                       if q.strip())
            # every REQUESTED name must appear in the checked set: a typo'd
            # or rows-only (no-oracle) name would otherwise silently vanish
            # from the artifact and the gate would report green on less
            # coverage than asked for
            missing = sorted(keep - set(art["queries"]))
            if missing:
                print(f"[scale] ERROR: requested verify queries never "
                      f"checked (typo or no oracle entry): "
                      f"{', '.join(missing)}", flush=True)
                for m in missing:
                    art["queries"][m] = {"status": "err", "rows": -1,
                                         "err": "requested but never checked"}
            not_run = sorted(set(art["queries"]) - keep - set(missing))
            art["queries"] = {k: v for k, v in art["queries"].items()
                              if k in keep}
            art["subset_of_suite"] = sorted(keep)
            art["not_in_subset"] = not_run
            art["excluded"] = sorted(set(FAMILY) - keep)
            if art["excluded"]:
                art["excluded_reason"] = (
                    "O(n^2) DuckDB oracle at this scale (q51 brute-force "
                    "NN; q154/q159 increment-x-corpus cosine); their "
                    "engine sides still run in the BENCH families")
        art.update(st)
        ok = sum(1 for v in art["queries"].values()
                 if v["status"] in ("ok", "ok_subset"))
        # check_oracle counted every suite query a subset Verify run did
        # not produce as a "no spark output" FAILURE; after the filter
        # above the top-level counts must describe the CHECKED set only
        # (r11 judge finding: a downstream reader of "fail": 115 concluded
        # the 100x gate was 71% red when n_fail was 0)
        art["ok"] = ok
        art["fail"] = len(art["queries"]) - ok
        art["n_ok"] = ok
        art["n_fail"] = len(art["queries"]) - ok
        with open(cj, "w") as f:
            json.dump(art, f, indent=1)
        print(f"[scale] {cj}: {ok} ok / {len(art['queries']) - ok} fail",
              flush=True)
        oracle_failed = (len(art["queries"]) - ok) > 0

    if not a.skip_bench:
        base_d = bench(a.base, a.reps, a.cpus, a.bench_queries)
        scale_d = bench(a.scale_dir, a.reps, a.cpus, a.bench_queries)
        ratios = {}
        for q, s in scale_d["queries"].items():
            b = base_d["queries"].get(q)
            # BOTH sides must have succeeded: a failed base run's error
            # time as denominator prints a plausible super-linear ratio
            if (b and b > 0 and scale_d["rows"].get(q, -1) >= 0
                    and base_d["rows"].get(q, -1) >= 0):
                ratios[q] = round(s / b, 2)
        med = sorted(ratios.values())[len(ratios) // 2] if ratios else None
        fam = {q: {"base_sec": round(base_d["queries"][q], 2),
                   "scale_sec": round(scale_d["queries"][q], 2),
                   "ratio": ratios.get(q)}
               for q in FAMILY if q in ratios}
        art = {
            "what": (f"per-query growth {a.base} -> {a.scale_dir} "
                     f"(ScaleGen corpus), warm prebuilt artifacts both "
                     f"sides, {a.reps} timed rep(s) (median), probe off, "
                     f"back-to-back on one box"),
            **st,
            "base": section(base_d),
            "scale": section(scale_d),
            "total_ratio": round(scale_d["value"] / base_d["value"], 2)
                if base_d["value"] else None,
            "median_query_ratio": med,
            "query_ratios": dict(sorted(ratios.items())),
            "dedup_ann_cluster_family": fam,
        }
        bj = f"{a.out_prefix}_BENCH.json"
        with open(bj, "w") as f:
            json.dump(art, f, indent=1)
        print(f"[scale] {bj}: total ratio {art['total_ratio']}, "
              f"median query ratio {med}", flush=True)

    if oracle_failed:
        # the artifacts are stamped and the bench already ran (a crash
        # before it was the r9 failure mode) — but the EXIT CODE must not
        # read green when the oracle went red, or a scripted caller
        # publishes a failed gate as evidence
        print("[scale] ORACLE FAILURES above — exiting non-zero", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
