"""Ground-truth relation statistics: the relation_stats.py equivalent
(reference: datasets/relation_stats.py:5-27 -- mean displacement of
the .relations ground truth pairs).

Usage: python scripts/relation_stats.py <file.relations>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sparse_gslam_tpu.eval.relations import load_relations


def main():
    t1, t2, gt = load_relations(sys.argv[1])
    disp = np.linalg.norm(gt[:, :2], axis=1)
    rot = np.degrees(np.abs(gt[:, 2]))
    dt = t2 - t1
    print(f"{len(t1)} relations")
    print(
        f"time separation: mean {dt.mean():.2f}s  "
        f"min {dt.min():.2f}  max {dt.max():.2f}"
    )
    print(
        f"displacement:    mean {disp.mean():.3f}m  "
        f"min {disp.min():.3f}  max {disp.max():.3f}"
    )
    print(
        f"rotation:        mean {rot.mean():.2f}deg  max {rot.max():.2f}"
    )


if __name__ == "__main__":
    main()
