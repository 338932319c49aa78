import time
import numpy as np, jax, jax.numpy as jnp
from depth_estimation_tpu.ops import matching

maxh = maxw = 16
B, H, W, K = 4, 465, 625, 10
rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.rand(B, H, W, K), jnp.float32)
f2 = jnp.asarray(rng.rand(B, H + 15, W + 15, K), jnp.float32)


def sync(x):
    float(np.asarray(jax.tree.leaves(x)[1]).ravel()[0])


for name, fn in [
    ("pallas f32 b8", lambda: matching.match_flow_fused(f1, f2, maxh, maxw, 8)),
    ("mxu f32 b8", lambda: matching.match_flow_mxu(f1, f2, maxh, maxw, 8, jnp.float32)),
    ("mxu bf16 b8", lambda: matching.match_flow_mxu(f1, f2, maxh, maxw, 8, jnp.bfloat16)),
    ("mxu bf16 b16", lambda: matching.match_flow_mxu(f1, f2, maxh, maxw, 16, jnp.bfloat16)),
    ("mxu bf16 b32", lambda: matching.match_flow_mxu(f1, f2, maxh, maxw, 32, jnp.bfloat16)),
]:
    t0 = time.perf_counter()
    out = fn(); sync(out)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / (N * B)
    print(f"{name}: compile {compile_t:.0f}s, {dt*1e3:.2f} ms/pair -> {1/dt:.0f} fps", flush=True)
