import time, jax, jax.numpy as jnp
from autorally_tpu.config import MPPIConfig
from autorally_tpu.costs.neural_costmap import fit_neural_costmap
from __graft_entry__ import _build

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) / n * 1000)
    return min(ts)

cfg = MPPIConfig(num_rollouts=65536, num_timesteps=100)
sp, params, cp, cm, state = _build(cfg)
nc, _ = fit_neural_costmap(cm, epochs=100)
cs = sp.init_state()
solve = jax.jit(sp._solve)
print('K=65536 fused nc solve (tile 2048): %.2f ms' %
      timeit(solve, params, cp, nc, state, cs), flush=True)
