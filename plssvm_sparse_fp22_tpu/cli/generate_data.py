"""``plssvm-generate-data``: synthetic dataset generator.

TPU-native equivalent of ``utility_scripts/generate_data.py`` (sklearn
``make_blobs``/``make_classification``/``make_gaussian_quantiles`` written as
LIBSVM or ARFF; used by the reference's test CMake to create its 5000x2000
stress set, ``tests/CMakeLists.txt:33-59``).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def generate(problem: str, samples: int, features: int, seed: int = 42):
    from sklearn import datasets

    if problem == "blobs":
        X, y = datasets.make_blobs(
            n_samples=samples, n_features=features, centers=2, random_state=seed
        )
    elif problem == "planes":
        X, y = datasets.make_classification(
            n_samples=samples, n_features=features,
            n_informative=max(2, features // 2), n_redundant=0,
            n_classes=2, random_state=seed,
        )
    elif problem == "ball":
        X, y = datasets.make_gaussian_quantiles(
            n_samples=samples, n_features=features, n_classes=2, random_state=seed
        )
    else:
        raise ValueError(f"unknown problem type '{problem}'")
    labels = np.where(y > 0, 1.0, -1.0)
    return X, labels


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="plssvm-generate-data", description="generate a synthetic data set"
    )
    parser.add_argument("--output", required=True, help="output file (.arff -> ARFF)")
    parser.add_argument("--samples", type=int, required=True)
    parser.add_argument("--features", type=int, required=True)
    parser.add_argument(
        "--problem", default="blobs", choices=["blobs", "planes", "ball"],
        help="sklearn generator to use",
    )
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    X, labels = generate(args.problem, args.samples, args.features, args.seed)

    if args.output.endswith(".arff"):
        from ..io.arff import write_arff_file

        write_arff_file(args.output, X, labels)
    else:
        from ..io.libsvm import write_libsvm_file

        write_libsvm_file(args.output, X, labels, sparse=False)
    print(f"wrote {args.samples} x {args.features} '{args.problem}' set to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
