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


def measure(rows, out, x, lp, num_heads, eps, block_b, geometry,
            attn_impl="staged2", ablate="none"):
    """One guarded probe point: a config that overflows scoped VMEM (the
    compiler rejects it at compile time) is recorded as oom=true instead of
    killing the sweep (the r5 first run died at seq=99 packed bt=32,
    107.3M > 100M scoped). Rows are flushed to disk after every point."""
    row = {"geometry": geometry, "seq": int(x.shape[1]), "block_b": block_b,
           "impl": attn_impl}
    if ablate != "none":
        row["ablate"] = ablate
    try:
        ms, comp = time_layer(x, lp, num_heads, eps, block_b,
                              attn_impl=attn_impl, ablate=ablate)
        row["ms_per_layer"] = round(ms, 4)
        row["compile_s"] = round(comp, 1)
    except Exception as e:  # noqa: BLE001 - jax wraps OOM as JaxRuntimeError
        msg = str(e)
        row["oom"] = "vmem" in msg.lower() or "memory" in msg.lower()
        row["error"] = msg.splitlines()[0][:200]
    rows.append(row)
    log(row)
    with open(out, "w") as fh:
        json.dump({"batch": B, "inner": INNER, "rows": rows}, fh, indent=1)
        fh.write("\n")


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "short_seq_block_results.json")
    cfg = deit_small(num_labels=100)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    # composed structure: 3/6 heads, 1/2 MLP channels (the preset geometry)
    bb, ccfg = prune_heads(
        {"layers": params["layers"]}, cfg,
        [list(range(0, cfg.num_heads, 2))] * cfg.num_layers)
    bb = prune_mlp_channels(bb, [list(range(0, cfg.mlp_dim, 2))] * cfg.num_layers)
    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), bb["layers"])
    # full dense geometry (6 heads x 64, mlp 1536): the headline/token50
    # serving rows run DENSE weights at S=99 after the 50% drop (and S=197 at
    # layer 0) — a bt win there moves the north-star 1.85x number directly
    dlp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["layers"])

    rows = []
    # preset live lengths (incl CLS): ultra tail 17, ultra mid 33, composed
    # tail 33, composed mid 66, headline 99 (calibration sanity anchor)
    for s in (17, 33, 66, 99):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, s, cfg.hidden_size),
                              jnp.bfloat16)
        for bt in (8, 16, 32, 64):
            measure(rows, out, x, lp, ccfg.num_heads, cfg.layernorm_eps, bt,
                    "composed")
        # where does the time go? 'attn' skips the logits/softmax/PV section
        # (QKV + O-proj + MLP remain): none - attn = the per-(image, head)
        # attention cost the packed impl attacks
        measure(rows, out, x, lp, ccfg.num_heads, cfg.layernorm_eps, 8,
                "composed", ablate="attn")
        # cross-image packed block-diagonal attention (ONE [bt*S, bt*S] dot
        # per head instead of bt underfilled [S, S] dots)
        for bt in (8, 16, 32):
            measure(rows, out, x, lp, ccfg.num_heads, cfg.layernorm_eps, bt,
                    "composed", attn_impl="packed")
    for s in (99, 197):
        x = jax.random.normal(jax.random.PRNGKey(2), (B, s, cfg.hidden_size),
                              jnp.bfloat16)
        for bt in (8, 16, 32):
            measure(rows, out, x, dlp, cfg.num_heads, cfg.layernorm_eps, bt,
                    "dense")

    # per-(geometry, seq) winner summary
    for g in ("composed", "dense"):
        for s in sorted({r["seq"] for r in rows if r["geometry"] == g}):
            sub = [r for r in rows
                   if r["seq"] == s and r["geometry"] == g
                   and "ablate" not in r and "ms_per_layer" in r]
            if not sub:
                continue
            best = min(sub, key=lambda r: r["ms_per_layer"])
            base = next(r for r in sub
                        if r["block_b"] == 8 and r["impl"] == "staged2")
            attn = next((r for r in rows if r["seq"] == s
                         and r["geometry"] == g
                         and r.get("ablate") == "attn"), None)
            attn_ms = (f", attn section "
                       f"{base['ms_per_layer'] - attn['ms_per_layer']:.3f} ms"
                       if attn else "")
            log(f"{g} S={s}: best {best['impl']} bt={best['block_b']} "
                f"{best['ms_per_layer']:.3f} ms "
                f"(staged2 bt=8: {base['ms_per_layer']:.3f} ms, "
                f"{base['ms_per_layer'] / best['ms_per_layer']:.2f}x{attn_ms})")
    print(json.dumps({"out": out, "rows": len(rows)}))


if __name__ == "__main__":
    main()
