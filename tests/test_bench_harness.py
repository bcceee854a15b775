"""The bench harness itself is a driver-facing deliverable: guard that
plain invocation emits all expected JSON metric lines with passing gates
(on tiny --smoke grids, CPU)."""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_bench_smoke_emits_all_configs():
    out = subprocess.run(
        [sys.executable, "bench.py", "--cpu", "--smoke"],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    metrics = {l["metric"] for l in lines}
    assert {"pmm_1h2h_20z_200m_1001k_latency", "config2_battaglia_pee_pme",
            "config3_hod_pgg_pgm", "config4_limber_ckk",
            "config5_ksz_nvv_snr",
            "batch16_pmm_per_cosmology"} <= metrics, metrics
    for l in lines:
        gates = [v for k, v in l.items() if k.startswith("accuracy_gate")]
        assert gates and all(g == "PASS" for g in gates), l
