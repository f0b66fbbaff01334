"""Synthetic-fallback test for the turnkey real-data parity harness
(tools/real_data_parity.py): materialised LETOR files, the .npz cache check,
our CV run, and — when torch + the reference repo are present — the
reference A/B through its own evaluator, all through the same entry point
that produces the north-star number on real data."""

import os

import pytest

from tools.real_data_parity import main, reference_available


def test_parity_harness_synthetic(tmp_path):
    report = main([
        "-data", "MQ2008_Super", "-model", "RankMSE", "-sf", "pointsf",
        "-epochs", "3", "-synth_queries", "60,20,20", "-no_assert",
        "-dir_output", str(tmp_path), "-out", str(tmp_path / "report.json"),
    ])
    assert report["synthetic"] is True
    assert report["cache"]["num_queries"] > 0
    assert report["cache"]["cached_reload_s"] <= report["cache"]["parse_s"] + 1
    assert 0.0 < report["ours"]["nDCG"][2] <= 1.0
    assert os.path.exists(tmp_path / "report.json")
    if reference_available():
        assert report["reference"] is not None
        assert 0.0 < report["reference"]["nDCG"][2] <= 1.0
        assert "parity_pass" in report
    else:  # environment without torch: harness must still degrade cleanly
        assert report["reference"] is None
