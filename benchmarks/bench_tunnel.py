"""Probe the axon tunnel: RTT and host<->device bandwidth for the transfer
sizes the streaming API moves per frame."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp


def probe_up(arr, n=8):
    d = jax.device_put(arr); float(jnp.ravel(d.astype(jnp.float32))[0])
    t0 = time.perf_counter()
    for _ in range(n):
        d = jax.device_put(arr)
    float(jnp.ravel(d.astype(jnp.float32))[0])
    return (time.perf_counter() - t0) / n


def probe_down(shape, dtype, n=8):
    d = jnp.ones(shape, dtype)
    np.asarray(d)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(d)
    return (time.perf_counter() - t0) / n


def main():
    rtt = probe_down((1,), jnp.float32, 20)
    print(f"RTT (1-elem fetch): {rtt*1e3:.1f} ms")
    for name, arr in [
        ("up f32 640x480x3 (3.7MB)", np.ones((480, 640, 3), np.float32)),
        ("up u8 640x480x3 (0.9MB)", np.ones((480, 640, 3), np.uint8)),
    ]:
        t = probe_up(arr)
        mb = arr.nbytes / 1e6
        print(f"{name}: {t*1e3:.1f} ms ({mb/t:.1f} MB/s)")
    for name, shape, dt in [
        ("down f32 180x320 (230KB)", (180, 320), jnp.float32),
        ("down f16 180x320 (115KB)", (180, 320), jnp.float16),
        ("down u8 180x320 (57KB)", (180, 320), jnp.uint8),
        ("down f32 180x320x3 (691KB)", (180, 320, 3), jnp.float32),
    ]:
        t = probe_down(shape, dt)
        print(f"{name}: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
