import sys
import numpy as np
import jax, jax.numpy as jnp
from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache(tag="tpu")
from bench import make_matcher_case
from sparse_gslam_tpu.ops import matching
from sparse_gslam_tpu.ops.grid import precompute_pyramid

grids, origin, res, pts = make_matcher_case()
depth = 5
spec = matching.search_spec(5.0, 1.0, 10.0, res)
pyrs = [np.asarray(precompute_pyramid(jnp.asarray(g), depth)) for g in grids]
sg = [jnp.asarray(p[0]) for p in pyrs]
pooled = [jnp.asarray(p[depth-1]) for p in pyrs]
origins = [jnp.asarray(origin, jnp.float32)]*16
th0 = [0.0]*16
# exhaustive: K = C*R so bounds don't matter
out = matching.match_candidates_fused(sg, pooled, origins, th0, pts.astype(np.float32),
    spec, 0.6, 16, K=16*225)
print("exhaustive-K fused:", out[0], round(out[1],4), out[2], file=sys.stderr)
# default K
out2 = matching.match_candidates_fused(sg, pooled, origins, th0, pts.astype(np.float32),
    spec, 0.6, 16, K=128)
print("K=128 fused:", out2[0], round(out2[1],4), out2[2], file=sys.stderr)
