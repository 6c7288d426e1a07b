"""Megakernel attention-variant timing lab (TPU, one-off measurement tool).

Times one DeiT-S fused layer at the dense (S=197) and 50%-pruned (S=99)
sequence lengths across attention implementations and batch-block sizes.
Writes incremental results to stderr and a JSON summary to
scripts/kernel_lab_results.json.

Methodology per CLAUDE.md: host-transfer sync per timed iteration (the relay's
block_until_ready does not synchronize), 12 layer calls per dispatch to
amortize the ~30 ms dispatch overhead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_pruning_tpu.configs import deit_small
from vit_pruning_tpu.models.vit import init_vit_params
from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer

B = 512
INNER = 12  # layer calls per dispatch (== one DeiT-S depth)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_variant(x, lp, num_heads, eps, attn_impl, block_b, ablate="none", iters=8):
    @jax.jit
    def fn(x, lp):
        def body(i, acc):
            y = fused_vit_layer(
                acc, lp, num_heads, eps=eps, attn_impl=attn_impl,
                block_b=block_b, ablate=ablate,
            )
            return y

        return jax.lax.fori_loop(0, INNER, body, x).sum()

    t0 = time.perf_counter()
    np.asarray(fn(x, lp))  # compile + warm
    compile_s = time.perf_counter() - t0
    np.asarray(fn(x, lp))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(x, lp))
        times.append(time.perf_counter() - t0)
    per_layer_ms = float(np.median(times)) / INNER * 1e3
    return per_layer_ms, compile_s


def time_xla(x, params, cfg, iters=8):
    from vit_pruning_tpu.models.vit import vit_layer

    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["layers"])

    @jax.jit
    def fn(x, lp):
        def body(i, acc):
            return vit_layer(acc, lp, cfg, use_pallas=False)

        return jax.lax.fori_loop(0, INNER, body, x).sum()

    t0 = time.perf_counter()
    np.asarray(fn(x, lp))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(x, lp))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(x, lp))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / INNER * 1e3, compile_s


def time_copy(x, iters=8):
    @jax.jit
    def fn(x):
        def body(i, acc):
            return acc + jnp.float32(1.0).astype(acc.dtype)

        return jax.lax.fori_loop(0, INNER, body, x).sum()

    t0 = time.perf_counter()
    np.asarray(fn(x))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / INNER * 1e3, compile_s


def time_encoder(x, params, cfg, block_b, iters=8):
    from vit_pruning_tpu.ops.pallas.model import fused_vit_encoder

    layers = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["layers"])

    @jax.jit
    def fn(x, layers):
        return fused_vit_encoder(
            x, layers, cfg.num_heads, eps=cfg.layernorm_eps, block_b=block_b
        ).sum()

    t0 = time.perf_counter()
    np.asarray(fn(x, layers))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(x, layers))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(x, layers))
        times.append(time.perf_counter() - t0)
    per_layer_ms = float(np.median(times)) / cfg.num_layers * 1e3
    return per_layer_ms, compile_s


def time_int8(x, lp, num_heads, eps, block_b, iters=8):
    from vit_pruning_tpu.ops.pallas.layer_int8 import fused_vit_layer_int8
    from vit_pruning_tpu.ops.quant import quantize_layer_params

    qp = jax.jit(quantize_layer_params)(lp)

    @jax.jit
    def fn(x, qp):
        def body(i, acc):
            return fused_vit_layer_int8(
                acc, qp, num_heads, eps=eps, block_b=block_b,
            )

        return jax.lax.fori_loop(0, INNER, body, x).sum()

    t0 = time.perf_counter()
    np.asarray(fn(x, qp))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(x, qp))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(x, qp))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / INNER * 1e3, compile_s


def main():
    cfg = deit_small(num_labels=100)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["layers"])

    results = []
    matrix = [
        # staged2 bf16 megakernel vs the int8 weight-matmul variant;
        # dispatch overhead (~2.5 ms/layer at INNER=12, measured via the
        # 'copy' control) is common to all rows — compare DELTAS.
        (99, "staged2", 8, "none"),
        (197, "staged2", 8, "none"),
        (99, "staged2", 8, "noexp"),       # softmax exp cost
        (197, "staged2", 8, "noexp"),
        (99, "staged2", 8, "nogelu"),      # GELU transcendental cost
        (197, "staged2", 8, "nogelu"),
        (99, "int8", 8, "none"),           # int8 weight-matmul megakernel
        (197, "int8", 8, "none"),
        (99, "copy", 0, "none"),           # dispatch-floor control, cached
    ]
    for s, impl, bb, ab in matrix:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, s, cfg.hidden_size),
                              jnp.bfloat16)
        try:
            if impl == "encoder":
                ms, comp = time_encoder(x, params, cfg, bb)
            elif impl == "xla":
                ms, comp = time_xla(x, params, cfg)
            elif impl == "copy":
                ms, comp = time_copy(x)
            elif impl == "int8":
                ms, comp = time_int8(x, lp, cfg.num_heads, cfg.layernorm_eps, bb)
            else:
                ms, comp = time_variant(x, lp, cfg.num_heads, cfg.layernorm_eps,
                                        impl, bb, ablate=ab)
            row = {"S": s, "impl": impl, "block_b": bb, "ablate": ab,
                   "ms_per_layer_b512": round(ms, 3), "compile_s": round(comp, 1)}
        except Exception as e:  # e.g. Mosaic rejects an impl at this shape
            row = {"S": s, "impl": impl, "block_b": bb, "ablate": ab,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        results.append(row)
        log(row)
        with open("scripts/kernel_lab_results.json", "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
