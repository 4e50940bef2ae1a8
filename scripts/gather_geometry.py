"""Gather-engine geometry A/B: N_OUT (output ints per device row).

The gather serving image is ROW-bound at scale (~3 ns/row; shrinking
image bytes 8.45 -> 2.36 B/int did not move the 908M rate — see
docs/STATUS.md round 4).  The remaining lever is ints/row: N_OUT=512
halves row count IF the FFD packer can still fill rows under the
TABLE_CLS=256 local-vocab budget.  This script measures that directly:
one child process per geometry (the constants are import-time,
DINT_TPU_N_OUT), same stream, same timed protocol, full check
optional.

Usage (TPU):
  python scripts/gather_geometry.py --stream .bench/bench.single_rect_dint.v2.bin \
      --dict .bench/dict.bench_collection.docs.rectangular.DSF-65536-16 \
      [--n-outs 256,512] [--runs 2000] [--check-collection PATH]
Writes bench_artifacts/gather_geometry.json.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
import dint_tpu  # noqa: F401  (heap/THP fixes)
from dint_tpu.tools import decode
rec = decode.decode_stream({type!r}, {stream!r}, {dict!r}, runs={runs},
                           check_collection={check!r}, engine="local")
print("GEOM_JSON " + json.dumps(rec))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", required=True)
    ap.add_argument("--dict", dest="dict_file", required=True)
    ap.add_argument("--type", default="single_rect_dint")
    ap.add_argument("--n-outs", default="256,512")
    ap.add_argument("--runs", type=int, default=2000)
    ap.add_argument("--check-collection", default=None)
    ap.add_argument("--out", default=os.path.join(
        REPO, "bench_artifacts", "gather_geometry.json"))
    args = ap.parse_args()

    results = {}
    for n_out in (int(x) for x in args.n_outs.split(",")):
        # NB: leave PYTHONPATH alone — it carries the axon plugin site
        # (/root/.axon_site); the rule is only to never ADD /root/repo
        # to it (the child uses sys.path.insert instead)
        env = dict(os.environ, DINT_TPU_N_OUT=str(n_out))
        code = CHILD.format(
            repo=REPO, type=args.type, stream=os.path.abspath(args.stream),
            dict=os.path.abspath(args.dict_file), runs=args.runs,
            check=(os.path.abspath(args.check_collection)
                   if args.check_collection else None),
        )
        print(f"[geometry] N_OUT={n_out} ...", file=sys.stderr)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True)
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("GEOM_JSON "):
                rec = json.loads(line[len("GEOM_JSON "):])
        if rec is None:
            print(f"[geometry] N_OUT={n_out} FAILED rc={r.returncode}\n"
                  f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}", file=sys.stderr)
            results[str(n_out)] = {"error": r.returncode}
            continue
        ints = int(rec["num_integers"])
        rec["gints_per_s"] = round(float(rec["ints_x_sec"]) / 1e9, 1)
        rec["image_B_per_int"] = round(int(rec["plan_bytes"]) / ints, 3)
        if "rows" in rec:
            rec["ints_per_row"] = round(ints / int(rec["rows"]), 1)
        results[str(n_out)] = rec
        print(f"[geometry] N_OUT={n_out}: {rec['gints_per_s']} G, "
              f"{rec['image_B_per_int']} B/int, "
              f"rows={rec.get('rows')}", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"stream": args.stream, "runs": args.runs,
                   "by_n_out": results}, f, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
