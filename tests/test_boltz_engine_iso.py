"""Process-isolated runner (see tests/_isolation.py: the XLA:CPU native
pipeline crashes nondeterministically on large scan/hierarchy programs
under accumulated full-suite state; the battery itself lives in
tests/_boltz_engine_suite.py and runs unchanged in a fresh subprocess)."""

from _isolation import run_isolated


def test_boltz_engine_suite_subprocess():
    run_isolated("_boltz_engine_suite.py")
