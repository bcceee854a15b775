"""Subprocess isolation for solver-heavy test batteries.

The XLA:CPU native pipeline on this host crashes nondeterministically
(SIGSEGV/abort) while compiling or cache-(de)serializing LARGE programs
-- big RK4/scan hierarchies, HMcode pipelines -- once the process has
accumulated a few hundred compiled programs (five independent full-suite
deaths this round, each on a different frame, all on such programs;
the same tests pass solo every time).  Running each heavy battery in a
fresh subprocess removes the accumulated-state trigger, and one retry
on a native-crash signature turns a residual flake into a recoverable
failure instead of killing the whole `pytest tests/ -x` run.
"""

import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent


def run_isolated(suite_file, timeout: int = 2400):
    """Run tests/<suite_file> (a name or a list of names -- several
    suites sharing one subprocess amortizes their compiles, the
    round-5 suite-time lever) via pytest in a fresh subprocess; retry
    once if the failure looks like a native crash rather than a real
    test failure."""
    files = [suite_file] if isinstance(suite_file, str) else list(suite_file)
    cmd = [sys.executable, "-m", "pytest",
           *(str(HERE / f) for f in files), "-q",
           "--no-header", "-p", "no:cacheprovider"]
    suite_file = " ".join(files)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(HERE.parent) + os.pathsep + \
        env.get("PYTHONPATH", "")
    for attempt in (1, 2):
        r = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, cwd=str(HERE.parent), env=env)
        if r.returncode == 0:
            if attempt == 2:
                # the retry passed, but a native crash DID happen --
                # keep it visible in the suite log so a recurring
                # repo-caused crash can't hide behind the environment
                # flake (ADVICE r4)
                print(f"\n[isolation] {suite_file}: native crash on "
                      f"attempt 1 (rc={first.returncode}); retry passed."
                      f" First-attempt tail:\n"
                      + (first.stdout + first.stderr)[-2000:],
                      file=sys.stderr)
            return
        crashed = r.returncode < 0 or "Fatal Python error" in (
            r.stdout + r.stderr)
        if not crashed:
            break  # real test failure: report, don't retry
        first = r
    raise AssertionError(
        f"{suite_file} rc={r.returncode} (attempt {attempt})\n"
        + r.stdout[-4000:] + r.stderr[-2000:])
