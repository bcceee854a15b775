"""First-run experience: the package installs offline and the examples
run against the INSTALLED package from a neutral directory (VERDICT r3
item 7 -- no hand-set repo PYTHONPATH, no axon-tunnel assumptions).
"""

import glob
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_install_and_example_subprocess(tmp_path):
    # a REAL (non-editable) offline install: builds the wheel with the
    # baked-in setuptools and copies the package into the target dir
    # (--target layouts work from a plain PYTHONPATH entry; editable
    # .pth finders would need site-dir processing).  The build runs
    # from a TEMP COPY of the source tree, never the repo itself, so
    # no build/ or *.egg-info artifacts are deposited in (let alone
    # committed to) the working tree (ADVICE r4, medium).
    import shutil
    src = tmp_path / "src"
    src.mkdir()
    for name in ("pyproject.toml", "README.md"):
        shutil.copy2(REPO / name, src / name)
    shutil.copytree(REPO / "hmvec_tpu", src / "hmvec_tpu",
                    ignore=shutil.ignore_patterns("__pycache__"))
    target = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", str(src),
         "--no-deps", "--no-build-isolation", "--quiet",
         "--target", str(target)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    sites = [str(target)]
    assert (target / "hmvec_tpu" / "__init__.py").exists()

    # a fresh user's environment: ONLY the installed package on the
    # path (no repo cwd, no /root/.axon_site tunnel shim -- jax then
    # selects its native default backend, the DEVNOTES first-run gotcha)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = sites[0]
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "fnl.py")],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fnl=+20" in r.stdout          # the example really computed
    # and the import really resolved to the installed copy, not the cwd
    r2 = subprocess.run(
        [sys.executable, "-c",
         "import hmvec_tpu, sys; print(hmvec_tpu.__file__)"],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path), env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert str(target) in r2.stdout  # resolved to the INSTALLED copy
