"""On-hardware kernel parity: every production kernel vs its jnp ground
truth on the real TPU (the pytest suite validates interpret mode on CPU;
this checks the compiled Mosaic/XLA output, which has shown
toolchain-specific failures — e.g. tpu.matmul's batch-dim limit,
RESULTS.md). Covers DeiT-S and ViT-L widths, bf16 + int8 (VERDICT r3 #3).

Prints one PASS/FAIL line per check and writes the full error table to
scripts/tpu_parity_results.json (committed artifact, regenerated each round).

    python scripts/tpu_parity.py [--out scripts/tpu_parity_results.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_pruning_tpu.configs import deit_small, vit_huge, vit_large
from vit_pruning_tpu.models.vit import embed, init_vit_params, layer_norm, vit_layer
from vit_pruning_tpu.ops.pallas.layer import (
    fused_vit_layer,
    fused_vit_layer_bucketed,
    fused_vit_layer_cls_logits,
)
from vit_pruning_tpu.ops.pallas.layer_int8 import fused_vit_layer_int8
from vit_pruning_tpu.ops.quant import int8_vit_layer_ref, quantize_layer_params

RESULTS = []


def check(name, got, ref, mask=None, tol=5e-2):
    got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    if mask is not None:
        got = got * np.asarray(mask)[..., None]
        ref = ref * np.asarray(mask)[..., None]
    rel = float(np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9))
    max_abs = float(np.abs(got - ref).max())
    ok = rel < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: rel {rel:.5f} "
          f"(max abs {max_abs:.4f})", flush=True)
    RESULTS.append({"check": name, "rel_err": round(rel, 6),
                    "max_abs_err": round(max_abs, 5), "tol": tol, "pass": ok})
    return ok


def run_width(tag, cfg, batch, seqs):
    """All layer-level production kernels at one model width."""
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["layers"])
    lp32 = jax.tree.map(lambda a: a.astype(jnp.float32), lp)
    ok = True
    for s in seqs:
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, s, cfg.hidden_size),
                              jnp.bfloat16)
        mask = jax.random.uniform(jax.random.PRNGKey(2), (batch, s)) > 0.3
        mask = mask.at[:, 0].set(True)

        # staged2 megakernel, unmasked + masked
        ref = vit_layer(x.astype(jnp.float32), lp32, cfg)
        got = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps)
        ok &= check(f"{tag} staged2 bf16 S={s}", got, ref, tol=2e-2)
        refm = vit_layer(x.astype(jnp.float32), lp32, cfg, token_mask=mask)
        gotm = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps,
                               token_mask=mask)
        ok &= check(f"{tag} staged2 bf16 masked S={s}", gotm, refm, mask=mask,
                    tol=2e-2)

        # int8 dynamic-quant megakernel vs its jnp int8 reference
        qp = quantize_layer_params(lp)
        ref8 = int8_vit_layer_ref(x, qp, cfg)
        got8 = fused_vit_layer_int8(x, qp, cfg.num_heads, eps=cfg.layernorm_eps)
        ok &= check(f"{tag} int8 S={s}", got8, ref8, tol=2e-2)

        # CLS-epilogue fusion (last layer + final-LN + classifier)
        lnf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["ln_f"])
        head = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["head"])
        yn = layer_norm(ref, jax.tree.map(lambda a: a.astype(jnp.float32),
                                          params["ln_f"]), cfg.layernorm_eps)
        ref_l = yn[:, 0] @ params["head"]["w"] + params["head"]["b"]
        got_l = fused_vit_layer_cls_logits(x, lp, lnf, head, cfg.num_heads,
                                           eps=cfg.layernorm_eps)
        ok &= check(f"{tag} cls_logits S={s}", got_l, ref_l, tol=2e-2)

        # fused bucketed mask-mode layer: gather+layer+scatter in VMEM
        kept_i = mask.astype(jnp.int32)
        counts = kept_i.sum(-1)
        kept_rank = jnp.cumsum(kept_i, axis=-1) - 1
        skip_rank = counts[:, None] + jnp.cumsum(1 - kept_i, axis=-1) - 1
        dest = jnp.where(mask, kept_rank, skip_rank)
        capb = int(np.asarray(counts).max())
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, capb, 1), 1)
        P = (dest[:, None, :] == rows).astype(jnp.float32)
        xc = jnp.einsum("brt,btd->brd", P, x.astype(jnp.float32))
        key_ok = jax.lax.broadcasted_iota(jnp.int32, (batch, capb), 1) < counts[:, None]
        yc = vit_layer(xc, lp32, cfg, token_mask=key_ok)
        yb = jnp.einsum("brt,brd->btd", P, yc)
        refb = jnp.where(mask[..., None], yb, x.astype(jnp.float32))
        gotb = fused_vit_layer_bucketed(x, lp, dest, mask, capb, cfg.num_heads,
                                        eps=cfg.layernorm_eps)
        ok &= check(f"{tag} bucketed S={s} cap={capb}", gotb, refb, tol=2e-2)
    return ok


def run_embeds(cfg, batch):
    """Embedding paths: conv-vs-matmul patch embed, the (unused, kept as a
    documented negative) fused Pallas float embed, and the uint8 serving
    embed vs the normalize->float ground truth."""
    from vit_pruning_tpu.ops.pallas.embed import embed_fused
    from vit_pruning_tpu.ops.patch_embed import patch_embed
    from vit_pruning_tpu.serving import embed_from_u8

    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    ok = True

    px32 = jax.random.normal(jax.random.PRNGKey(3), (batch, 3, 224, 224),
                             jnp.float32)
    # conv (TPU production) vs matmul (the bit-parity reference form)
    ref_pe = patch_embed(px32, params["embed"]["patch"], cfg.patch_size,
                         impl="matmul")
    got_pe = patch_embed(px32, params["embed"]["patch"], cfg.patch_size,
                         impl="conv")
    ok &= check("embed conv-vs-matmul f32", got_pe, ref_pe, tol=1e-4)

    ep = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["embed"])
    px = px32.astype(jnp.bfloat16)
    ref_e = embed(px32, jax.tree.map(lambda a: a.astype(jnp.float32),
                                     params["embed"]), cfg)
    got_e = embed_fused(px, ep, cfg)
    ok &= check("embed_fused (documented-negative kernel)", got_e, ref_e,
                tol=2e-2)

    # uint8 serving embed: embed_from_u8(u8) must match normalize->embed
    u8 = jax.random.randint(jax.random.PRNGKey(4), (batch, 3, 224, 224),
                            0, 256, jnp.int32).astype(jnp.uint8)
    xf = (u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    ref_u = embed(xf, jax.tree.map(lambda a: a.astype(jnp.float32),
                                   params["embed"]), cfg)
    got_u = embed_from_u8(u8, ep, cfg)
    ok &= check("serving embed_from_u8 vs normalize->embed", got_u, ref_u,
                tol=2e-2)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tpu_parity_results.json"))
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    devs = jax.devices()
    ok = run_width("deit_s", deit_small(num_labels=100), args.batch, (99, 197))
    # ViT-L width (the largest geometry the bench serves); S=33 is the ultra
    # tail length at L, S=197 the dense length
    ok &= run_width("vit_l", vit_large(num_labels=100), max(4, args.batch // 4),
                    (33, 197))
    # ViT-H width: head_dim 80 is the only non-power-of-two head width the
    # bench serves, and seq 257 the only non-DeiT grid — both must clear the
    # real Mosaic toolchain, not just interpret mode
    ok &= run_width("vit_h", vit_huge(num_labels=100), max(4, args.batch // 4),
                    (33, 257))
    ok &= run_embeds(deit_small(num_labels=100), args.batch)

    artifact = {
        "devices": [str(d) for d in devs],
        "backend": jax.default_backend(),
        "checks": RESULTS,
        "all_pass": bool(ok),
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(("ALL PASS" if ok else "SOME FAILED") + f" -> {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
