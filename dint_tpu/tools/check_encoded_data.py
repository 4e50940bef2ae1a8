"""Consistency checker — vroom_env/check_encoded_data.cpp equivalent.

Decodes an encoded stream and compares every integer against the
gap-transformed source collection; exits non-zero on the first
mismatch, like the reference (:20-120).

    python -m dint_tpu.tools.check_encoded_data <type> <encoded_file>
        <collection_file> [--dict DICT_FILE]
"""

from __future__ import annotations

import argparse

from . import common, decode


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "type", choices=sorted(common.DINT_KINDS) + list(common.VROOM_ZOO)
    )
    ap.add_argument("encoded_file")
    ap.add_argument("collection_file")
    ap.add_argument("--dict", dest="dict_file")
    args = ap.parse_args(argv)
    if args.type in common.VROOM_ZOO:
        decode.decode_zoo(
            args.type, args.encoded_file, 1, args.collection_file
        )
    else:
        decode.decode_stream(
            args.type,
            args.encoded_file,
            args.dict_file,
            runs=1,
            check_collection=args.collection_file,
        )
    common.log("everything's good")


if __name__ == "__main__":
    main()
