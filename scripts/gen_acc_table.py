"""Accuracy table generator: the gen_acc_table.py equivalent
(reference: datasets/gen_acc_table.py:21-34 builds the paper Table I
from the *_trans_error.log/_rot_error.log files written by eval.sh).

Reads the error logs produced by sparse_gslam_tpu.eval.cli for a list
of datasets/tags and emits a markdown table (instead of LaTeX).

Usage: python scripts/gen_acc_table.py datasets/sim-office:sim-office:run ...
       (each arg is dir:name:tag)

A 4th field turns the row into a TRAJECTORY-FILE row (VERDICT r4 #7):
    dir:name:tag:/path/to/result.txt
The FLASER trajectory (our .result format == GMapping's result
format, reference datasets/intel-lab/30pts.txt) is evaluated
IN-PROCESS against dir/name.relations via eval/relations (the
metricEvaluator-equivalent), so the paper's GMapping baseline columns
(gen_acc_table.py:22-33 reads `<d>-gmapping-30_*_error.log`)
regenerate the moment real .relations ground truth lands -- no
error-log files needed. Until then the row reports the parsed
trajectory's span so the plumbing is exercised end-to-end.
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


def get_error_std(fname):
    # line 2 = "mean, std, ..." (same contract as the reference's
    # gen_acc_table.py:1-2)
    return list(
        map(float, open(fname).readlines()[1].split(", ")[:2])
    )


def row_from_error_logs(d, name, tag):
    prefix = os.path.join(d, name)
    t = get_error_std(f"{prefix}-{tag}_trans_error.log")
    r = get_error_std(f"{prefix}-{tag}_rot_error.log")
    return (name, tag, t, r, None)


def row_from_trajectory(d, name, tag, traj_path):
    import numpy as np

    from sparse_gslam_tpu.eval import relations

    times, poses = relations.load_result(traj_path)
    assert len(times) > 0, f"no FLASER lines parsed from {traj_path}"
    rel_path = os.path.join(d, f"{name}.relations")
    if os.path.exists(rel_path):
        res = relations.evaluate_files(traj_path, rel_path)
        return (
            name, tag,
            [res.trans_mean, res.trans_std],
            [float(np.degrees(res.rot_mean)),
             float(np.degrees(res.rot_std))],
            None,
        )
    span = float(times.max() - times.min())
    note = (
        f"parsed {len(times)} poses, {span:.0f} s span; "
        f"awaiting {name}.relations"
    )
    return (name, tag, None, None, note)


def main():
    rows = []
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        if len(parts) == 3:
            rows.append(row_from_error_logs(*parts))
        elif len(parts) >= 4:
            d, name, tag = parts[:3]
            rows.append(
                row_from_trajectory(d, name, tag, ":".join(parts[3:]))
            )
        else:
            raise SystemExit(f"bad spec {spec!r}: want dir:name:tag[:file]")
    print("| dataset | tag | trans ATE (m) | rot ATE (deg) |")
    print("|---|---|---|---|")
    for name, tag, t, r, note in rows:
        if note is not None:
            print(f"| {name} | {tag} | {note} | — |")
        else:
            print(
                f"| {name} | {tag} | {t[0]:.4f} ± {t[1]:.4f} "
                f"| {r[0]:.3f} ± {r[1]:.3f} |"
            )


if __name__ == "__main__":
    main()
