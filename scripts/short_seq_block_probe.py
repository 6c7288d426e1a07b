"""Batch-block size at SHORT sequences: is bt=8 still right for the presets?

The fused layer's bt=8 default was calibrated at the dense/headline sequence
lengths (S=197/99, scripts/kernel_lab.py). The composed/ultra presets spend
most layers at S = 17-66 (schedule live counts), where a bt=8 grid step
feeds only bt*S_pad = 136-528 rows to the MXU and the per-step weight DMA
(Mosaic re-fetches constant blocks per kernel *call*, amortized across grid
steps) is amortized over fewer FLOPs. This probes bt in {8,16,32,64} at the
composed DeiT-S geometry (3 heads x 64, mlp 768) across the preset sequence
lengths, bf16, B=512 — the bs_sweep result says these presets sit at 40-46%
MFU, so any win here moves the headline ultra/composed numbers directly.

Writes scripts/short_seq_block_results.json.
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
from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

B = 512
INNER = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_layer(x, lp, num_heads, eps, block_b, iters=8,
               attn_impl="staged2", ablate="none"):
    @jax.jit
    def fn(x, lp):
        def body(i, acc):
            return fused_vit_layer(acc, lp, num_heads, eps=eps,
                                   block_b=block_b, attn_impl=attn_impl,
                                   ablate=ablate)

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
    return float(np.median(times)) / INNER * 1e3, compile_s


def main():
    cfg = deit_small(num_labels=100)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    # composed structure: 3/6 heads, 1/2 MLP channels (the preset geometry)
    bb, ccfg = prune_heads(
        {"layers": params["layers"]}, cfg,
        [list(range(0, cfg.num_heads, 2))] * cfg.num_layers)
    bb = prune_mlp_channels(bb, [list(range(0, cfg.mlp_dim, 2))] * cfg.num_layers)
    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), bb["layers"])

    rows = []
    # preset live lengths (incl CLS): ultra tail 17, ultra mid 33, composed
    # tail 33, composed mid 66, headline 99 (calibration sanity anchor)
    for s in (17, 33, 66, 99):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, s, cfg.hidden_size),
                              jnp.bfloat16)
        for bt in (8, 16, 32, 64):
            ms, comp = time_layer(x, lp, ccfg.num_heads, cfg.layernorm_eps, bt)
            row = {"seq": s, "block_b": bt, "impl": "staged2",
                   "ms_per_layer": round(ms, 4), "compile_s": round(comp, 1)}
            rows.append(row)
            log(row)
        # where does the time go? 'attn' skips the logits/softmax/PV section
        # (QKV + O-proj + MLP remain): none - attn = the per-(image, head)
        # attention cost the packed impl attacks
        ms, comp = time_layer(x, lp, ccfg.num_heads, cfg.layernorm_eps, 8,
                              ablate="attn")
        row = {"seq": s, "block_b": 8, "impl": "staged2", "ablate": "attn",
               "ms_per_layer": round(ms, 4), "compile_s": round(comp, 1)}
        rows.append(row)
        log(row)
        # cross-image packed block-diagonal attention (ONE [bt*S, bt*S] dot
        # per head instead of bt underfilled [S, S] dots)
        for bt in (8, 16, 32):
            ms, comp = time_layer(x, lp, ccfg.num_heads, cfg.layernorm_eps,
                                  bt, attn_impl="packed")
            row = {"seq": s, "block_b": bt, "impl": "packed",
                   "ms_per_layer": round(ms, 4), "compile_s": round(comp, 1)}
            rows.append(row)
            log(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "short_seq_block_results.json")
    with open(out, "w") as fh:
        json.dump({"batch": B, "inner": INNER, "geometry": "deit_small composed"
                   " (3 heads x 64, mlp 768)", "rows": rows}, fh, indent=1)
    # per-seq winner summary
    for s in sorted({r["seq"] for r in rows}):
        sub = [r for r in rows if r["seq"] == s and "ablate" not in r]
        best = min(sub, key=lambda r: r["ms_per_layer"])
        base = next(r for r in sub
                    if r["block_b"] == 8 and r["impl"] == "staged2")
        attn = next((r for r in rows if r["seq"] == s
                     and r.get("ablate") == "attn"), None)
        attn_ms = (f", attn section {base['ms_per_layer'] - attn['ms_per_layer']:.3f} ms"
                   if attn else "")
        log(f"S={s}: best {best['impl']} bt={best['block_b']} "
            f"{best['ms_per_layer']:.3f} ms "
            f"(staged2 bt=8: {base['ms_per_layer']:.3f} ms, "
            f"{base['ms_per_layer'] / best['ms_per_layer']:.2f}x{attn_ms})")
    print(json.dumps({"out": out, "rows": len(rows)}))


if __name__ == "__main__":
    main()
