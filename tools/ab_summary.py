"""Summarize the controlled infusion A/B (docs/quality/ab/*.json) into the
seeds x arms table VERDICT r3 item 2 asks for.

Metrics per run:
  * best FID + epoch (the retention metric quality_run tracks),
  * epochs-to-floor-region: first epoch whose FID enters within
    ``--floor_margin`` x the run's own real-vs-real floor (the reference's
    "epochs to quality" is a visual bar, README.md:62-81; the floor region
    is this corpus's objective stand-in),
  * AUC-style robustness: median FID over the last 10 epochs (collapse
    detector — a run can touch the floor once and then diverge).

Aggregates mean +/- spread over seeds per arm and prints a markdown table
(stdout) + JSON (--out).

Usage: python tools/ab_summary.py [--dir docs/quality/ab] [--floor_margin 1.10]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def is_run_json(path: str) -> bool:
    """Run JSONs carry meta+history; sibling artifacts (summary.json,
    power.json) in the same directory do not and are skipped."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return isinstance(d, dict) and "meta" in d and "history" in d


def summarize_run(path: str, floor_margin: float) -> dict:
    with open(path) as f:
        d = json.load(f)
    meta, hist = d["meta"], d["history"]
    floor = meta["fid_floor_real_vs_real"]
    fids = [(r["epoch"], r["fid"]) for r in hist if "fid" in r]
    best_e, best = min(fids, key=lambda t: t[1]) if fids else (None, float("nan"))
    thresh = floor * floor_margin
    to_floor = next((e for e, f in fids if f <= thresh), None)
    tail = [f for _, f in fids[-10:]]
    return {
        "run": os.path.splitext(os.path.basename(path))[0],
        "loss_type": meta["loss_type"],
        "seed": meta.get("seed"),
        "n_critic": meta.get("n_critic", 1),
        "g_ema_decay": meta.get("g_ema_decay"),
        "critic": meta.get("critic", "unconditional"),
        "arch": meta.get("arch", "dcgan"),
        "epochs": len(hist),
        "floor": round(floor, 1),
        "best_fid": round(best, 1),
        "best_epoch": best_e,
        "epochs_to_floor_region": to_floor,
        "tail_median_fid": round(float(np.median(tail)), 1) if tail else None,
        # last recorded epoch's FID (epochs are 0-based throughout)
        "final_fid": round(fids[-1][1], 1) if fids else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="docs/quality/ab")
    p.add_argument("--floor_margin", type=float, default=1.10,
                   help="floor-region threshold = margin x real-vs-real floor")
    p.add_argument("--out", default="docs/quality/ab/summary.json")
    args = p.parse_args()

    runs = [summarize_run(f, args.floor_margin)
            for f in sorted(glob.glob(os.path.join(args.dir, "*.json")))
            if is_run_json(f)]
    if not runs:
        print(f"no run JSONs in {args.dir}")
        return

    cols = ["run", "epochs", "best_fid", "best_epoch",
            "epochs_to_floor_region", "tail_median_fid", "floor"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in runs:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")

    # seed aggregates for the base arms (dcgan, unconditional, n_critic=1,
    # no EMA — the controlled comparison)
    def base(arm):
        rs = [r for r in runs
              if r["loss_type"] == arm and r["n_critic"] == 1
              and r["g_ema_decay"] is None and r["critic"] == "unconditional"
              and r["arch"] == "dcgan" and r["seed"] is not None]
        # dedupe replicas of the same (arm, seed) — e.g. the checkpointed
        # rerun wgan_ckpt replays seed 2's exact config — preferring the
        # canonical `{arm}_s{seed}` run so aggregates count each seed once
        by_seed = {}
        for r in rs:
            cur = by_seed.get(r["seed"])
            canonical = r["run"] == f"{arm}_s{r['seed']}"
            if cur is None or (canonical and cur["run"] != f"{arm}_s{r['seed']}"):
                by_seed[r["seed"]] = r
        return [by_seed[s] for s in sorted(by_seed)]

    agg = {}
    for arm in ("wgan", "wganvae"):
        rs = base(arm)
        if not rs:
            continue
        bests = [r["best_fid"] for r in rs]
        floors = [r["epochs_to_floor_region"] for r in rs]
        reached = [e for e in floors if e is not None]
        agg[arm] = {
            "seeds": [r["seed"] for r in rs],
            "best_fid_mean": round(float(np.mean(bests)), 1),
            "best_fid_min": round(float(np.min(bests)), 1),
            "best_fid_max": round(float(np.max(bests)), 1),
            "epochs_to_floor_region": floors,
            "reached_floor": f"{len(reached)}/{len(rs)}",
            "epochs_to_floor_mean": (round(float(np.mean(reached)), 1)
                                     if reached else None),
        }
    print("\naggregates (base arms, mean over seeds):")
    print(json.dumps(agg, indent=1))
    with open(args.out, "w") as f:
        json.dump({"runs": runs, "aggregates": agg,
                   "floor_margin": args.floor_margin}, f, indent=1)
    print(f"[done] {args.out}")


if __name__ == "__main__":
    main()
