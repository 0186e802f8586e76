"""convert_and_verify runbook tool: the partial-artifact path must produce a
usable report (VERDICT r4 next #10) — the first machine with any real release
file gets evidence with zero friction (docs/REAL_WEIGHTS.md)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def test_partial_report_campplus_only(tmp_path, capsys):
    from test_onnx_convert import build_campplus_onnx

    from cosyvoice2_eu_tpu.models import campplus as cam
    from tools.convert_and_verify import main

    cfg = cam.tiny_campplus_config()
    rng = np.random.default_rng(0)
    build_campplus_onnx(tmp_path / "campplus.onnx", cfg, rng, t_in=200)

    out = tmp_path / "report.json"
    rc = main(["--model_dir", str(tmp_path), "--skip-torch",
               "--skip-synthesis", "--out", str(out)])
    report = json.loads(out.read_text())
    assert report["partial"] is True
    assert report["artifacts_found"] == ["campplus.onnx"]
    assert set(report["artifacts_missing"]) == {
        "llm.pt", "flow.pt", "hift.pt", "speech_tokenizer_v2.onnx"}
    assert "campplus" in report and report["campplus"]["ok"]
    assert report["all_ok"] and rc == 0


def test_empty_dir_reports_missing(tmp_path, capsys):
    from tools.convert_and_verify import main

    rc = main(["--model_dir", str(tmp_path), "--skip-torch",
               "--skip-onnx", "--skip-synthesis"])
    assert rc == 1
    report = json.loads(capsys.readouterr().out)
    assert report["error"] == "no checkpoint artifacts found"
    assert len(report["artifacts_missing"]) == 5
