"""Console entry points (pyproject [project.scripts]).

Thin wrappers around the experiment drivers so an installed qbn_tpu
exposes `qbn-run` / `qbn-sweep` without needing the repo checkout layout
(the drivers themselves live in experiments/ next to this package and are
also importable from an installed tree via these shims).
"""

from __future__ import annotations

import os
import sys


def _add_experiments_path():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (repo, os.path.join(repo, "experiments")):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)


def run_main(argv=None):
    _add_experiments_path()
    import run
    return run.main(argv)


def sweep_main(argv=None):
    _add_experiments_path()
    from experiments import sweep
    return sweep.main(argv)
