import time, sys
import numpy as np
import jax, jax.numpy as jnp
from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache(tag="tpu")
from bench import make_matcher_case
from sparse_gslam_tpu.ops import matching
from sparse_gslam_tpu.ops.grid import precompute_pyramid
from sparse_gslam_tpu.io.native import correlative_match_many_native

grids, origin, res, pts = make_matcher_case()
n_cands = len(grids)
depth = 5
spec = matching.search_spec(5.0, 1.0, 10.0, res)
pyrs = [np.asarray(precompute_pyramid(jnp.asarray(g), depth)) for g in grids]
score_grids = [jnp.asarray(p[0]) for p in pyrs]
pooled = [jnp.asarray(p[depth-1]) for p in pyrs]
origins = [jnp.asarray(origin, jnp.float32)]*n_cands
thetas = [0.0]*n_cands
stride = 1 << (depth-1)

t0=time.perf_counter()
out = matching.match_candidates_fused(score_grids, pooled, origins, thetas,
    pts.astype(np.float32), spec, 0.6, stride)
print("warm (compile):", time.perf_counter()-t0, "s; result:", out[0], out[1], file=sys.stderr)
reps=10
t0=time.perf_counter()
for _ in range(reps):
    out = matching.match_candidates_fused(score_grids, pooled, origins, thetas,
        pts.astype(np.float32), spec, 0.6, stride)
fused_ms = (time.perf_counter()-t0)/reps*1e3
print(f"fused match: {fused_ms:.1f} ms  (result {out[0]} {out[1]:.4f} pose {np.asarray(out[2])})", file=sys.stderr)

correlative_match_many_native(grids, np.tile(origin,(n_cands,1)), res, pts, thetas,
    spec.angular_step, spec.n_angular, spec.n_linear, depth, 0.6)
t0=time.perf_counter()
for _ in range(3):
    got = correlative_match_many_native(grids, np.tile(origin,(n_cands,1)), res, pts, thetas,
        spec.angular_step, spec.n_angular, spec.n_linear, depth, 0.6)
native_ms = (time.perf_counter()-t0)/3*1e3
print(f"native: {native_ms:.1f} ms (result {got[0]} {got[1]:.4f}); ratio {native_ms/fused_ms:.2f}", file=sys.stderr)
