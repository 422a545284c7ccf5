"""Run every example end-to-end (reference doc/examples/runexamples.jl).

Usage: python examples/run_examples.py [--cpu]
"""

import argparse
import importlib
import os
import sys
import time

EXAMPLES = [
    "readme_normal",
    "bivariate_normal_gibbs",
    "poisson_mh",
    "gamma_mh",
    "normal_adaptive",
    "swiss_samplers",
    "rats_gibbs",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="run on the CPU platform")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (klara_tpu)
    sys.path.insert(0, here)
    for name in EXAMPLES:
        print(f"===== {name} =====", flush=True)
        t0 = time.perf_counter()
        importlib.import_module(name).main()
        print(f"----- {name}: {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
