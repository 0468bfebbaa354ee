"""Log-format converter: the my_convert.py counterpart (reference root
my_convert.py:11-216 converts CARMEN/Radish logs to rosbags for ROS
consumption; here the useful direction is the reverse -- render any
supported provider stream, including the Crazyflie rosbags, as a
CARMEN FLASER log so every dataset works with every tool).

Usage: python scripts/convert_log.py <in.log> <provider> <out.log>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        return 2
    src, provider, dst = sys.argv[1:4]
    from sparse_gslam_tpu.io.providers import create_data_provider

    n = 0
    with open(dst, "w") as f:
        for fr in create_data_provider(provider, src).frames():
            r = " ".join(f"{v:.4f}" for v in fr.ranges)
            p = fr.pose
            f.write(
                f"FLASER {len(fr.ranges)} {r} {p[0]:.6f} {p[1]:.6f} "
                f"{p[2]:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{fr.time:.6f} convert {fr.time:.6f}\n"
            )
            n += 1
    print(f"wrote {n} FLASER frames to {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
