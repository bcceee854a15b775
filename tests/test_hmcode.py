"""Process-isolated runner for the HMcode battery (tests/_hmcode_suite.py;
see tests/_isolation.py for why: four of five full-suite native crashes
this round were on hmcode-family programs)."""

from _isolation import run_isolated


def test_hmcode_suite_subprocess():
    run_isolated("_hmcode_suite.py")
