"""Subprocess smokes for the perf tools (probe_int8_mxu, bench_quant).

These scripts are run bare on the TPU host (``python tools/<x>.py``), so the
smoke's job is to prove they import, bootstrap sys.path themselves, and
complete end-to-end on the CPU-interpret tier with tiny shape overrides.
No reference counterpart (the reference has no perf tooling); guards the
deploy-quant flow of ``ops/pallas/fused_transfer.py`` (``quant='int8'``).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.cli  # subprocess-heavy: excluded from the default run

REPO = Path(__file__).resolve().parent.parent


def run_tool(script, *args, env_extra=None, timeout=1200):
    env = dict(os.environ)
    env["RST_PLATFORM"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.update(env_extra or {})
    result = subprocess.run(
        [sys.executable, str(REPO / script), *map(str, args)],
        capture_output=True, text=True, timeout=timeout,
        cwd="/", env=env,  # cwd elsewhere: the script must bootstrap itself
    )
    if result.returncode != 0:
        raise AssertionError(
            f"{script} failed ({result.returncode}):\n"
            f"{result.stdout}\n{result.stderr}")
    return result


def test_probe_int8_mxu_smoke():
    """All four plain arms + both band-realistic arms run on interpret."""
    out = run_tool(
        "tools/probe_int8_mxu.py",
        env_extra={"PROBE_M": "256", "PROBE_NREP": "2",
                   "PROBE_KLO": "1", "PROBE_KHI": "2"},
    ).stdout
    for arm in ("pallas_bf16", "pallas_int8", "xla_bf16", "xla_int8",
                "band_bf16", "band_int8"):
        assert arm in out, out
        assert f"{arm:12s}: FAILED" not in out, out


@pytest.mark.parametrize("arm", [["--tower", "batched"],
                                 ["--tower", "scan", "--remat"]])
def test_bench_train_step_smoke(arm):
    """The loss-tower measurement arms complete and report (the split arm is
    the production default exercised by the trainer tests; these are the
    re-measurement arms — a crash here would waste real-TPU tunnel time)."""
    out = run_tool(
        "tools/bench_train_step.py", "--spec", "rst-128-16-8-3",
        "--batch", "1", "--k", "1", "2", "--trials", "1", *arm,
    ).stdout
    rec = json.loads([ln for ln in out.splitlines() if ln.startswith("{")][0])
    assert rec["metric"] == "train_step_ms" and rec["value"] > 0, rec


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_bisect_fused_smoke(quant):
    """The per-stage bisect tool runs on interpret with both engine arms
    (first coverage of the tool; --quant int8 preps TPU-day analysis)."""
    out = run_tool(
        "tools/bisect_fused.py", "--spec", "rst-128-16-8-17",
        "--k", "1", "2", "--trials", "1", "--stages", "0", "1",
        "--quant", quant,
    ).stdout
    rec = json.loads([ln for ln in out.splitlines() if ln.startswith("{")][0])
    assert rec["quant"] == quant and len(rec["prefix_ms"]) == 1, rec


def test_bench_quant_smoke():
    """bf16 + int8 engines calibrate, bench, and report fidelity."""
    out = run_tool(
        "tools/bench_quant.py", "--spec", "rst-128-16-8-17",
        env_extra={"BENCH_KLO": "1", "BENCH_KHI": "2"},
    ).stdout
    lines = [json.loads(ln) for ln in out.splitlines()
             if ln.startswith("{")]
    engines = {d["engine"]: d for d in lines}
    assert set(engines) == {"bf16", "int8"}, out
    assert engines["int8"]["psnr_db"] > 35.0, engines["int8"]
    assert engines["int8"]["max_err"] < 0.1, engines["int8"]
