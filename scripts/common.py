"""Shared driver helpers for the experiment scripts (scripts/ of the
reference, modernized to python3 + this repo's CLI modules)."""

import subprocess
import sys


def run(args):
    cmd = [sys.executable, "-m"] + args
    print("$", " ".join(cmd), file=sys.stderr, flush=True)
    subprocess.run(cmd, check=True)
