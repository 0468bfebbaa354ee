"""Accuracy table generator: the gen_acc_table.py equivalent
(reference: datasets/gen_acc_table.py:21-34 builds the paper Table I
from the *_trans_error.log/_rot_error.log files written by eval.sh).

Reads the error logs produced by sparse_gslam_tpu.eval.cli for a list
of datasets/tags and emits a markdown table (instead of LaTeX).

Usage: python scripts/gen_acc_table.py datasets/sim-office:sim-office:run ...
       (each arg is dir:name:tag)
"""
import os
import sys


def get_error_std(fname):
    # line 2 = "mean, std, ..." (same contract as the reference's
    # gen_acc_table.py:1-2)
    return list(
        map(float, open(fname).readlines()[1].split(", ")[:2])
    )


def main():
    rows = []
    for spec in sys.argv[1:]:
        d, name, tag = spec.split(":")
        prefix = os.path.join(d, name)
        t = get_error_std(f"{prefix}-{tag}_trans_error.log")
        r = get_error_std(f"{prefix}-{tag}_rot_error.log")
        rows.append((name, tag, t, r))
    print("| dataset | tag | trans ATE (m) | rot ATE (deg) |")
    print("|---|---|---|---|")
    for name, tag, t, r in rows:
        print(
            f"| {name} | {tag} | {t[0]:.4f} ± {t[1]:.4f} "
            f"| {r[0]:.3f} ± {r[1]:.3f} |"
        )


if __name__ == "__main__":
    main()
