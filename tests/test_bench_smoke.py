"""CPU smoke tests for bench.py — the driver's BENCH entry point.

The driver runs ``python bench.py`` and records the LAST stdout line as the
round's benchmark JSON, so a regression in bench.py's arg handling, mode
dispatch, or JSON emission silently empties the round record.  These tests
run the real script in a subprocess (CPU platform forced in-process, like
conftest) at tiny shapes:

  - ``--mode all --budget 0``: the budget guard must skip every non-headline
    pillar (text/clipseg/int8/fusion) and still print the EGM headline JSON
    last — the exact driver contract.
  - ``--mode train``: the train metric line with the round-1 baseline field.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import jax
jax.config.update('jax_platforms', 'cpu')
import sys
sys.argv = ['bench.py'] + {argv!r}
import runpy
runpy.run_path({bench!r}, run_name='__main__')
"""


def run_bench(argv, timeout=600, n_virtual_devices=1):
    code = RUNNER.format(argv=argv, bench=os.path.join(REPO, "bench.py"))
    env = dict(os.environ, EGM_COMPILER_OPTIONS="none")
    if n_virtual_devices > 1:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{n_virtual_devices}")
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing"
    return lines


def test_mode_all_budget_zero_prints_headline_first_and_last():
    lines = run_bench(["--mode", "all", "--budget", "0", "--size", "64",
                       "--headline-batches", "2", "--n1", "1", "--n2", "2",
                       "--repeats", "1"])
    # every non-headline pillar must announce it was skipped
    skipped = [ln for ln in lines if ln.startswith("# skipping")]
    assert {s.split()[2].rstrip(":") for s in skipped} == {
        "text", "clipseg", "int8df", "fusion"}
    # headline-FIRST (r03 postmortem): the first JSON line is already the
    # headline, so a driver kill at any later point still has a record
    first = json.loads(next(ln for ln in lines if ln.startswith("{")))
    assert first["metric"] == "egm_unet_64px_inference_throughput"
    rec = json.loads(lines[-1])  # the driver parses the LAST line
    assert rec["metric"] == "egm_unet_64px_inference_throughput"
    assert rec["unit"] == "images/s/chip"
    assert rec["value"] > 0
    assert rec["batch"] == 2
    assert "reemit" not in rec  # the final line is the clean record


def test_mode_inference_dp_mesh():
    # the --mesh DP serving path: batch sharded over an 8-device mesh,
    # params replicated, GSPMD partitioning the whole chained program
    lines = run_bench(["--mode", "inference", "--mesh", "8", "--size", "64",
                       "--batches", "8", "--n1", "1", "--n2", "2",
                       "--repeats", "1"], n_virtual_devices=8)
    assert any(ln.startswith("# dp mesh: 8 x cpu") for ln in lines), lines[:5]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "egm_unet_64px_inference_throughput"
    assert rec["value"] > 0


def test_mode_train_metric_line():
    lines = run_bench(["--mode", "train", "--size", "48", "--batches", "2",
                       "--n1", "1", "--n2", "2", "--repeats", "1"])
    rec = json.loads(lines[-1])
    assert rec["metric"] == "egm_unet_48px_train_throughput"
    assert rec["metric_baseline"] == "round1_bs8_31.9_img_s"
    assert rec["value"] > 0
    assert rec["ms_per_step"] > 0
