#!/usr/bin/env python3
"""Regenerate ``tests/data/parity_golden.npz`` from the torch reference.

Run from the repo root with torch + ``/root/reference`` available:

    python tests/gen_parity_goldens.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_runners import run_all  # noqa: E402


def main() -> None:
    out = run_all()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "parity_golden.npz"
    )
    np.savez_compressed(path, **out)
    print(f"wrote {path}:")
    for k, v in sorted(out.items()):
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
