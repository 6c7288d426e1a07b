"""Probe: patch-embed formulations on TPU (the ~1.2 ms/batch fixed cost).

Three mathematically identical implementations of HF's Conv2d(C,D,P,stride=P):
  reshape  — current ops/patch_embed.py: 6-D transpose -> [B,N,CPP] @ W
  dotgen   — dot_general contracting (c,ph,pw) directly on the reshaped view
             (no materialized transpose; XLA picks the layout)
  conv     — lax.conv_general_dilated with kernel==stride

Amortized timing (inner loop inside one jit), host-transfer sync, same-run
copy control — the bench.py methodology. Also times each followed by the
pos-add + CLS-concat epilogue (the full `embed` op), since fusion behavior
differs. Detail to stderr, one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import deit_small
from vit_pruning_tpu.models.vit import init_vit_params


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def amortized(fn, inner=24):
    @jax.jit
    def f(w, b, x):
        def body(i, acc):
            return acc + fn(w, b, x + i.astype(x.dtype) * 1e-6).sum()

        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))

    return f


def timeit(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    cfg = deit_small(num_labels=100)
    P, D, C = cfg.patch_size, cfg.hidden_size, 3
    B, inner = 512, 24
    dtype = jnp.bfloat16
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    w = params["embed"]["patch"]["w"].astype(dtype)  # [C*P*P, D]
    bb = params["embed"]["patch"]["b"].astype(dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, 224, 224), dtype)
    gh = 224 // P

    def f_reshape(w, b, x):
        xx = x.reshape(B, C, gh, P, gh, P).transpose(0, 2, 4, 1, 3, 5)
        return xx.reshape(B, gh * gh, C * P * P) @ w + b

    def f_dotgen(w, b, x):
        xx = x.reshape(B, C, gh, P, gh, P)
        w6 = w.reshape(C, P, P, D)
        # contract (c, ph, pw) == xx dims (1, 3, 5) with w6 dims (0, 1, 2)
        y = jax.lax.dot_general(
            xx, w6, (((1, 3, 5), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(B, gh * gh, D).astype(x.dtype) + b

    def f_conv(w, b, x):
        w4 = w.reshape(C, P, P, D).transpose(3, 0, 1, 2)  # OIHW
        y = jax.lax.conv_general_dilated(
            x, w4, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
        )
        return y.reshape(B, gh * gh, D) + b

    def f_copy(w, b, x):
        return x * 1.000001  # dispatch control

    fns = {"reshape": f_reshape, "dotgen": f_dotgen, "conv": f_conv,
           "copy_control": f_copy}
    # numeric parity first
    ref = np.asarray(f_reshape(w, bb, x), np.float32)
    for name in ("dotgen", "conv"):
        got = np.asarray(fns[name](w, bb, x), np.float32)
        err = np.abs(got - ref).max()
        log(f"parity {name}: max|diff| = {err:.5f}")

    out = {}
    for name, fn in fns.items():
        t = timeit(amortized(fn, inner), (w, bb, x)) / inner
        out[name] = round(t * 1e3, 3)
        log(f"{name:13s}: {t * 1e3:.3f} ms/batch")

    # uint8 serving embed: the fused Pallas kernel (normalize+project+pos in
    # VMEM, ops/pallas/embed.py) vs XLA normalize->strided-conv->pos
    from vit_pruning_tpu.ops.pallas.embed import embed_u8

    embed_params = {
        "patch": {"w": w, "b": bb},
        "cls": params["embed"]["cls"].astype(dtype),
        "pos": params["embed"]["pos"].astype(dtype),
    }
    u8 = jax.random.randint(jax.random.PRNGKey(2), (B, C, 224, 224), 0, 256,
                            jnp.int32).astype(jnp.uint8)
    pos = embed_params["pos"][:, 1:, :]

    def f_u8_pallas(w_, b_, u):
        return embed_u8(u, embed_params, cfg)

    def f_u8_conv(w_, b_, u):
        xn = ((u.astype(dtype) / 255.0) - 0.5) / 0.5
        y = f_conv(w_, b_, xn) + pos
        cls = (embed_params["cls"][0] + embed_params["pos"][0, :1]).astype(y.dtype)
        cls = jnp.broadcast_to(cls[None], (y.shape[0], 1, y.shape[-1]))
        return jnp.concatenate([cls, y], axis=1)

    for name, fn in (("u8_pallas", f_u8_pallas), ("u8_conv", f_u8_conv)):
        @jax.jit
        def g(w_, b_, u, fn=fn):
            def body(i, acc):
                uu = (u + i.astype(jnp.uint8)).astype(jnp.uint8)
                return acc + fn(w_, b_, uu).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))
        t = timeit(g, (w, bb, u8)) / inner
        out[name] = round(t * 1e3, 3)
        log(f"{name:13s}: {t * 1e3:.3f} ms/batch")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
