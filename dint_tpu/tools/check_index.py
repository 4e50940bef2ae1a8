"""Standalone index verifier (src/check_index.cpp equivalent).

    python -m dint_tpu.tools.check_index <index_type> <index_file>
        <collection_basename>
"""

from __future__ import annotations

import argparse

from ..index import dint_index
from . import common


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("index_type", choices=sorted(common.DINT_KINDS))
    ap.add_argument("index_file")
    ap.add_argument("collection_basename")
    args = ap.parse_args(argv)
    idx = dint_index.DintIndex.load(args.index_file)
    dint_index.verify_index(idx, args.collection_basename)
    common.log("it's all good")


if __name__ == "__main__":
    main()
