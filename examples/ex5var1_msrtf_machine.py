"""MSRTF variant: a single R instruction can execute
(reference `examples/ex5var1_msrtf_machine.py`; t_max=80, plus the
length-4 window argmin/argmax report)."""

import argparse

from ex5_msrtf_machine import run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jax", choices=["jax", "scipy"])
    ap.add_argument("--cl-k", type=int, default=5)
    ap.add_argument("--observables-only", action="store_true",
                    default=True,
                    help="device-side projections only (default)")
    ap.add_argument("--full-spd", dest="observables_only",
                    action="store_false")
    args = ap.parse_args()
    run("ex5var1-msrtf-machine", "ex5var1_msrtf", 80.0,
        backend=args.backend, cl_k=args.cl_k, print_window_extrema=True,
        chunk_size=500 if args.observables_only else 200,
        observables_only=args.observables_only)


if __name__ == "__main__":
    main()
