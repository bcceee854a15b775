"""Process-isolated runner for the three hierarchy-solver batteries
(boltzlite, boltz engine, mnu fluid) in ONE subprocess.

See tests/_isolation.py: the XLA:CPU native pipeline crashes
nondeterministically on large scan/hierarchy programs under accumulated
full-suite state, so solver batteries run outside the main process.
Round 5 (VERDICT r4 item 1): the three batteries share the hierarchy
machinery -- recombination, solve_perturbations, compute_cls -- so one
process with one set of compiles replaces three processes that each
paid their own (the batteries also share solver grid shapes where the
physics allows: the boltz-engine convergence test reuses the mnu
battery's 12-mode grid).
"""

from _isolation import run_isolated


def test_hierarchy_batteries_subprocess():
    run_isolated(["_boltzlite_suite.py", "_boltz_engine_suite.py",
                  "_mnu_fluid_suite.py"], timeout=4200)
