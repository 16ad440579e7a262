"""Tests for the queue completeness gate and the A/B power analysis.

``tools/run_complete.py`` is the ADVICE-r4 fix: a restartable queue must not
treat a partial per-epoch-rewritten JSON as final (round 4 shipped a 25/30
run that way). These tests pin the contract the queue scripts rely on.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_complete(*args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_complete.py"), *args],
        capture_output=True).returncode


def write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)
    return str(path)


class TestRunComplete:
    def test_missing_and_empty_files_incomplete(self, tmp_path):
        assert run_complete("exists", str(tmp_path / "nope.json")) == 1
        p = tmp_path / "empty.json"
        p.touch()
        assert run_complete("exists", str(p)) == 1

    def test_exists_kind_passes_on_nonempty(self, tmp_path):
        p = write(tmp_path / "x.json", {"anything": 1})
        assert run_complete("exists", p) == 0

    def test_quality_partial_history_incomplete(self, tmp_path):
        p = write(tmp_path / "q.json", {"history": [{"epoch": i} for i in range(25)]})
        assert run_complete("quality", p, "30") == 1
        p = write(tmp_path / "q2.json", {"history": [{"epoch": i} for i in range(30)]})
        assert run_complete("quality", p, "30") == 0

    def test_quality_ckpt_requires_bundle(self, tmp_path):
        p = write(tmp_path / "q.json", {"history": [{"epoch": i} for i in range(30)]})
        ck = tmp_path / "x_last.model"
        assert run_complete("quality_ckpt", p, "30", str(ck)) == 1
        ck.write_bytes(b"\x00")
        assert run_complete("quality_ckpt", p, "30", str(ck)) == 0

    def test_keys_kind(self, tmp_path):
        p = write(tmp_path / "k.json", {"real": 1, "mixed": 2})
        assert run_complete("keys", p, "real,mixed") == 0
        assert run_complete("keys", p, "real,rnagan_synthetic,mixed") == 1

    def test_corrupt_json_incomplete(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert run_complete("quality", str(p), "1") == 1


class TestAbPower:
    def _summary(self, tmp_path, wgan, wganvae):
        runs = []
        for arm, vals in (("wgan", wgan), ("wganvae", wganvae)):
            for s, fid in enumerate(vals):
                runs.append({"run": f"{arm}_s{s}", "loss_type": arm, "seed": s,
                             "n_critic": 1, "g_ema_decay": None,
                             "critic": "unconditional", "arch": "dcgan",
                             "best_fid": fid, "floor": 265.4})
        # a non-canonical replica and a projection run must be excluded
        runs.append({"run": "wgan_ckpt", "loss_type": "wgan", "seed": 0,
                     "n_critic": 1, "g_ema_decay": None,
                     "critic": "unconditional", "arch": "dcgan",
                     "best_fid": 1.0, "floor": 265.4})
        runs.append({"run": "wganvae_proj", "loss_type": "wganvae", "seed": 0,
                     "n_critic": 1, "g_ema_decay": None,
                     "critic": "projection", "arch": "dcgan",
                     "best_fid": 1.0, "floor": 265.4})
        return write(tmp_path / "summary.json", {"runs": runs})

    def _run(self, tmp_path, summary):
        out = str(tmp_path / "power.json")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ab_power.py"),
             "--summary", summary, "--out", out], capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
        with open(out) as f:
            return json.load(f)

    def test_known_case(self, tmp_path):
        # equal variances, gap 100, sd 100: n = 2*(1.96+0.8416)^2 ~ 15.7 -> 16
        s = self._summary(tmp_path, [400.0, 500.0, 600.0], [300.0, 400.0, 500.0])
        d = self._run(tmp_path, s)
        assert d["observed_gap"] == 100.0
        assert d["within_arm_sd"]["pooled"] == 100.0
        assert d["seeds_per_arm_for_80pct_power"]["observed_gap"] == 16
        # replicas/projection excluded from the arms
        assert len(d["arms"]["wgan"]) == 3 and len(d["arms"]["wganvae"]) == 3
        assert all(v != 1.0 for _, v in d["arms"]["wgan"])

    def test_matches_committed_power_json(self, tmp_path):
        """The committed power.json must be reproducible from the committed
        summary.json (guards against hand-edited numbers)."""
        committed = os.path.join(REPO, "docs", "quality", "ab", "power.json")
        summary = os.path.join(REPO, "docs", "quality", "ab", "summary.json")
        if not (os.path.exists(committed) and os.path.exists(summary)):
            pytest.skip("no committed power analysis")
        d = self._run(tmp_path, summary)
        with open(committed) as f:
            want = json.load(f)
        assert d == want
