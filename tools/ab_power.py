"""Power analysis for the infusion A/B (VERDICT r4 item 4).

The controlled wganvae-vs-wgan comparison (``docs/quality/QUALITY.md``)
returned cannot-distinguish at n=3: the within-arm seed spread exceeded the
between-arm mean gap. This tool makes the "how many seeds WOULD decide it"
question a committed number instead of an aside: from the landed per-seed
best FIDs in ``ab/summary.json`` it estimates the pooled within-arm SD and
computes, via the standard two-sample normal approximation

    n_per_arm = 2 * sigma^2 * (z_{1-alpha/2} + z_{power})^2 / delta^2

the seeds-per-arm needed to detect (a) the *observed* arm gap and (b) the
reference's implied effect (their headline is a ~40-60% epoch-budget cut,
reference README.md:62-81; mapped here to the same relative cut of the
baseline's mean best FID as a generous stand-in, since epochs-to-floor is
right-censored in most runs and best-FID is the only uncensored per-seed
quality scalar).

Output: ``docs/quality/ab/power.json`` + a printed table. Rerun after any
seed lands: ``python tools/ab_power.py``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

# z values; avoids a scipy dependency for two constants
Z = {0.975: 1.959964, 0.8: 0.841621, 0.9: 1.281552}


def n_per_arm(sigma: float, delta: float, power: float = 0.8) -> float:
    if delta <= 0:
        return float("inf")
    return 2.0 * sigma**2 * (Z[0.975] + Z[power]) ** 2 / delta**2


def welch_t(a, b):
    """Welch's t and two-sided p (normal approx for the tail — at these n
    the t tail is wider, so the p is a LOWER bound on the true p; fine for
    a cannot-distinguish argument, stated in the output)."""
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se = math.sqrt(va / len(a) + vb / len(b))
    t = (ma - mb) / se if se else float("inf")
    p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(t) / math.sqrt(2))))
    return t, p


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--summary", default="docs/quality/ab/summary.json")
    p.add_argument("--out", default="docs/quality/ab/power.json")
    args = p.parse_args()

    with open(args.summary) as f:
        runs = json.load(f)["runs"]

    arms = {}
    for arm in ("wgan", "wganvae"):
        # the controlled base arms only: dcgan, unconditional, nc=1, no EMA,
        # canonical {arm}_s{seed} runs (ab_summary.py's same dedupe rule)
        arms[arm] = sorted(
            (r["seed"], r["best_fid"]) for r in runs
            if r["loss_type"] == arm and r["n_critic"] == 1
            and r["g_ema_decay"] is None and r["critic"] == "unconditional"
            and r["arch"] == "dcgan" and r["run"] == f"{arm}_s{r['seed']}")

    a = [v for _, v in arms["wgan"]]
    b = [v for _, v in arms["wganvae"]]
    if len(a) < 2 or len(b) < 2:
        sys.exit("need >=2 seeds per arm")
    mean_a, mean_b = sum(a) / len(a), sum(b) / len(b)
    var_a = sum((x - mean_a) ** 2 for x in a) / (len(a) - 1)
    var_b = sum((x - mean_b) ** 2 for x in b) / (len(b) - 1)
    # pooled within-arm SD (equal weighting; arms are same-size by design)
    sigma = math.sqrt((var_a + var_b) / 2.0)
    observed_gap = abs(mean_a - mean_b)
    t, pval = welch_t(a, b)

    # reference-implied effect: their RNA-GAN reaches quality in 24 vs 39 /
    # 11 vs 91 epochs (38%/88% cuts). Map the MORE CONSERVATIVE 38% relative
    # improvement onto the baseline arm's mean best FID above the floor.
    floor = next(r["floor"] for r in runs if r["loss_type"] == "wgan")
    ref_delta = 0.38 * max(mean_a - floor, 0.0)

    out = {
        "arms": {"wgan": arms["wgan"], "wganvae": arms["wganvae"]},
        "n_per_arm_now": [len(a), len(b)],
        "mean_best_fid": {"wgan": round(mean_a, 1), "wganvae": round(mean_b, 1)},
        "within_arm_sd": {"wgan": round(math.sqrt(var_a), 1),
                          "wganvae": round(math.sqrt(var_b), 1),
                          "pooled": round(sigma, 1)},
        "observed_gap": round(observed_gap, 1),
        "welch_t": round(t, 3),
        "p_two_sided_normal_approx_lower_bound": round(pval, 3),
        "floor": floor,
        "reference_implied_delta_fid": round(ref_delta, 1),
        "seeds_per_arm_for_80pct_power": {
            "observed_gap": math.ceil(n_per_arm(sigma, observed_gap, 0.8)),
            "reference_implied": math.ceil(n_per_arm(sigma, ref_delta, 0.8)),
        },
        "seeds_per_arm_for_90pct_power": {
            "observed_gap": math.ceil(n_per_arm(sigma, observed_gap, 0.9)),
            "reference_implied": math.ceil(n_per_arm(sigma, ref_delta, 0.9)),
        },
        "note": ("two-sample normal-approximation power on best-FID; the p "
                 "value uses the normal tail so it UNDERSTATES the true "
                 "Welch p at small n (conservative for any claimed win, "
                 "generous for cannot-distinguish — quote it only as a "
                 "lower bound)"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
