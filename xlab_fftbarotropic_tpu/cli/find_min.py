"""`xfb-find-min` — field minima CLI.

Drop-in for find_min.out (/root/reference/src/find_min.cpp:67-99): reads
field filenames from stdin (one per line; the `ls output | grep pres_step`
pipeline, test/01-runtest/invert.sh:2), prints the 30 smallest values as
"x y value" lines.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from ._platform import apply_env_platform
    apply_env_platform()
    from ..config import add_config_args, config_from_args
    from ..diagnostics.find_min import find_min_n, format_minima
    from ..io.fieldio import read_field

    p = argparse.ArgumentParser(prog="xfb-find-min")
    p.add_argument("-n", "--num", type=int, default=30,
                   help="number of minima (reference default 30)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    add_config_args(p)
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    cfg = config_from_args(args)

    print("Entering find_min program.", file=sys.stderr)
    for raw in sys.stdin:
        fname = raw.strip()
        if not fname:
            continue
        data = read_field(fname, cfg.grid_shape)
        print(f"File {fname} read.", file=sys.stderr)
        x, y, vals = find_min_n(data, args.num)
        print(format_minima(x, y, vals))
    print("find_min program ends. Congrats!", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
