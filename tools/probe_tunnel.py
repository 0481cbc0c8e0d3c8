#!/usr/bin/env python
"""Quantify axon-tunnel control-plane costs that shape the SLAM loop.

Measures, on the live TPU:
  1. per-dispatch submission latency of a tiny jitted op (eager-op cost),
  2. block_until_ready() cost on an ALREADY-READY array,
  3. block_until_ready() cost while a long kernel is queued (does the
     "no-op" still pay a round trip?),
  4. Array.is_ready() cost (the _pool_prefix fast-path query),
  5. scalar value-fetch RTT (baseline ~30 ms from PERF.md).

The SLAM loop makes 1-3 of these control calls per frame; at ~30 ms RTT
each they would explain most of the measured wall-vs-device gap
(124 ms/frame wall vs 62.7 ms/frame device, round-3 xplane trace).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def ms(t0):
    return (time.monotonic() - t0) * 1000.0


def main() -> None:
    dev = jax.devices()[0]
    print("device:", dev)

    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    tiny(x).block_until_ready()

    # 1. dispatch-only latency: submit 50 tiny ops WITHOUT fetching
    t0 = time.monotonic()
    y = x
    for _ in range(50):
        y = tiny(y)
    t_submit = ms(t0)
    t0 = time.monotonic()
    float(y[0])
    t_drain = ms(t0)
    print(f"1. 50 tiny dispatches: submit {t_submit:.1f} ms "
          f"({t_submit / 50:.2f} ms/dispatch), drain+fetch {t_drain:.1f} ms")

    # 2. block_until_ready on a ready array
    r = tiny(x)
    float(r[0])
    t0 = time.monotonic()
    for _ in range(10):
        jax.block_until_ready(r)
    print(f"2. block_until_ready(ready) x10: {ms(t0):.1f} ms")

    # 3. block_until_ready with a deep queue: queue a big matmul chain
    big = jax.jit(lambda a: a @ a)
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    big(a).block_until_ready()
    t0 = time.monotonic()
    q = a
    for _ in range(30):
        q = big(q)
    t_q = ms(t0)
    t0 = time.monotonic()
    jax.block_until_ready(q)
    t_bur = ms(t0)
    t0 = time.monotonic()
    float(jnp.sum(q[0, :1]))
    t_fetch = ms(t0)
    print(f"3. queue 30 big matmuls: submit {t_q:.1f} ms, "
          f"block_until_ready {t_bur:.1f} ms, then fetch {t_fetch:.1f} ms")

    # 4. is_ready cost
    r2 = tiny(x)
    float(r2[0])
    t0 = time.monotonic()
    for _ in range(20):
        r2.is_ready()
    print(f"4. is_ready(ready) x20: {ms(t0):.1f} ms")
    q2 = big(big(a))
    t0 = time.monotonic()
    for _ in range(5):
        q2.is_ready()
    print(f"   is_ready(queued) x5: {ms(t0):.1f} ms")
    jax.block_until_ready(q2)

    # 5. scalar fetch RTT
    r3 = tiny(x)
    jax.block_until_ready(r3)
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        float(r3[0])
        ts.append(ms(t0))
    ts.sort()
    print(f"5. scalar fetch of ready value: median {ts[2]:.1f} ms, all "
          f"{[round(t, 1) for t in ts]}")


if __name__ == "__main__":
    main()
