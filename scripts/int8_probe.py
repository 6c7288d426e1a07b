"""One-off probe: does this Mosaic toolchain support int8 MXU matmuls in
Pallas, and at what speed vs bf16? Decides whether an int8 serving mode is
worth building. Writes scripts/int8_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 1600, 384, 1536  # DeiT-S fc1 shape at bt=8, s=200
INNER = 64


def matmul_kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(o_ref.dtype)


def bench(dtype, acc_t, out_t):
    x = (np.random.RandomState(0).randn(M, K) * 10).astype(dtype)
    w = (np.random.RandomState(1).randn(K, N) * 10).astype(dtype)

    f = pl.pallas_call(
        lambda x_ref, w_ref, o_ref: matmul_kernel(x_ref, w_ref, o_ref, acc_t=acc_t),
        out_shape=jax.ShapeDtypeStruct((M, N), out_t),
    )

    @jax.jit
    def loop(x, w):
        def body(i, acc):
            return acc + f(x + i.astype(x.dtype), w).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    t0 = time.perf_counter()
    np.asarray(loop(x, w))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(loop(x, w))
        times.append(time.perf_counter() - t0)
    us = float(np.median(times)) / INNER * 1e6
    tflops = 2 * M * K * N / (us * 1e-6) / 1e12
    return {"dtype": str(dtype.__name__), "us_per_matmul": round(us, 1),
            "tflops": round(tflops, 1), "compile_s": round(compile_s, 1)}


def main():
    results = []
    for dtype, acc, out in [
        (jnp.bfloat16, jnp.float32, jnp.bfloat16),
        (jnp.int8, jnp.int32, jnp.int32),
    ]:
        try:
            r = bench(dtype, acc, out)
        except Exception as e:
            r = {"dtype": str(dtype), "error": f"{type(e).__name__}: {str(e)[:400]}"}
        print(r, file=sys.stderr, flush=True)
        results.append(r)
    with open("scripts/int8_probe.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
