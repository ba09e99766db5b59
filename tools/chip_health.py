"""Quick chip-health probe: time a fixed matmul loop on device (compile once)."""
import sys, time
sys.path.insert(0,"/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
x = jnp.asarray(np.random.RandomState(0).randn(256, 2048), jnp.bfloat16)
w = jnp.asarray(np.random.RandomState(1).randn(2048, 2048), jnp.bfloat16)
@jax.jit
def run(x, w):
    def body(acc, _):
        return (acc @ w).astype(jnp.bfloat16), None
    y, _ = lax.scan(body, x, None, length=2000)
    return jnp.sum(y.astype(jnp.float32))
float(run(x, w))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); float(run(x, w)); best = min(best, time.perf_counter()-t0)
fl = 2*256*2048*2048*2000
print(f"matmul loop: {best*1e3:.1f} ms => {fl/best/1e12:.1f} TFLOP/s effective "
      f"(this CHAINED loop is latency-bound: ~68-70 on a healthy chip here — "
      f"compare against that, not against the 197 TF peak)")
