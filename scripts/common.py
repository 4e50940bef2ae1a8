"""Shared driver helpers for the experiment scripts (scripts/ of the
reference, modernized to python3 + this repo's CLI modules)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args):
    """Run a dint_tpu CLI module (args = [module, argv...]) from any
    working directory.

    The repo path is injected via sys.path inside the child, NOT via
    PYTHONPATH: the axon TPU relay helper inherits PYTHONPATH and chip
    init silently falls back to CPU with it set (CLAUDE.md rule)."""
    mod, rest = args[0], list(args[1:])
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"sys.argv = [{mod!r}] + {rest!r}; "
        f"import runpy; runpy.run_module({mod!r}, run_name='__main__')"
    )
    print("$ python -m", " ".join(args), file=sys.stderr, flush=True)
    subprocess.run([sys.executable, "-c", code], check=True)
