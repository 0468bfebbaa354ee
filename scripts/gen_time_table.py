"""Timing table generator: the gen_time_table.py equivalent
(reference: datasets/gen_time_table.py:1-24, paper Table II) from the
.ftime/.btime/.dtime streams written by the runner.

Usage: python scripts/gen_time_table.py datasets/sim-office:sim-office ...
       (each arg is dir:name)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_gslam_tpu.eval.timing import analyze


def main():
    print(
        "| dataset | data interval (s) | frontend mean/max (ms) "
        "| backend mean/max (ms) | total per frame (ms) "
        "| steady frontend mean/max (ms) | steady backend mean/max (ms) "
        "| steady total/frame (ms) | compile (s / ticks) |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for spec in sys.argv[1:]:
        d, name = spec.split(":")
        st = analyze(os.path.join(d, name))
        print(
            f"| {name} | {st.mean_data_interval:.3f} "
            f"| {st.mean_frontend * 1e3:.1f} / {st.max_frontend * 1e3:.0f} "
            f"| {st.mean_backend * 1e3:.1f} / {st.max_backend * 1e3:.0f} "
            f"| {st.mean_total_per_frame * 1e3:.1f} "
            f"| {st.steady_mean_frontend * 1e3:.1f} / "
            f"{st.steady_max_frontend * 1e3:.0f} "
            f"| {st.steady_mean_backend * 1e3:.1f} / "
            f"{st.steady_max_backend * 1e3:.0f} "
            f"| {st.steady_mean_total_per_frame * 1e3:.1f} "
            f"| {st.compile_tick_total:.1f} / {st.n_compile_ticks} |"
        )


if __name__ == "__main__":
    main()
