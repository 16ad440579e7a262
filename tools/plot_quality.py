"""Render the FID-vs-epoch comparison (RNA-GAN wganvae vs GAN wgan) from
tools/quality_run.py outputs into docs/quality/: a PNG plot + a summary table.

Usage: python tools/plot_quality.py runs/quality/wganvae.json runs/quality/wgan.json \
           --out docs/quality
"""

from __future__ import annotations

import argparse
import json
import os


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="quality_run JSON files")
    p.add_argument("--out", default="docs/quality")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    floor = None
    table = []
    # multi-seed A/B styling: one color per arm, seeds distinguished by line
    arm_color = {"wganvae": "tab:blue", "wgan": "tab:orange"}
    seen_arms = set()
    for path in args.runs:
        run = load(path)
        hist = run["history"]
        loss = run["meta"]["loss_type"]
        stem = os.path.splitext(os.path.basename(path))[0]
        arm_name = {"wganvae": "RNA-GAN (wganvae)", "wgan": "GAN (wgan)"}.get(loss, loss)
        label = arm_name if loss not in seen_arms else None  # one legend row/arm
        multi = len(args.runs) > 2
        seen_arms.add(loss)
        epochs = [h["epoch"] + 1 for h in hist if "fid" in h]
        fids = [h["fid"] for h in hist if "fid" in h]
        ax.plot(epochs, fids, marker="o", ms=3, lw=1.2,
                color=arm_color.get(loss), alpha=0.75 if multi else 1.0,
                label=label)
        label = stem  # per-run label for the table below
        floor = run["meta"].get("fid_floor_real_vs_real", floor)
        best = min(fids) if fids else float("nan")
        best_ep = epochs[fids.index(best)] if fids else -1
        mean_step = (sum(h["step_ms"] for h in hist) / len(hist)) if hist else 0
        table.append({
            "run": label, "epochs": len(hist), "best_fid": round(best, 1),
            "best_epoch": best_ep, "final_fid": round(fids[-1], 1) if fids else None,
            "mean_step_ms": round(mean_step, 1),
            "mean_epoch_s": round(sum(h["train_s"] for h in hist) / len(hist), 1),
        })
    if floor is not None:
        ax.axhline(floor, color="gray", ls="--", lw=1,
                   label=f"real-vs-real floor ({floor:.0f})")
    ax.set_xlabel("epoch")
    ax.set_ylabel("FID (whitened fixed-feature InceptionV3)")
    ax.set_yscale("log")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title("Synthetic-histology corpus: FID vs training epoch")
    fig.tight_layout()
    png = os.path.join(args.out, "fid_curves.png")
    fig.savefig(png, dpi=130)
    print(f"wrote {png}")
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(table, f, indent=1)
    for row in table:
        print(row)


if __name__ == "__main__":
    main()
