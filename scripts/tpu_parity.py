"""On-hardware kernel parity: megakernel variants vs jnp references on the
real TPU (the pytest suite validates interpret mode on CPU; this checks the
compiled Mosaic output). Prints one PASS/FAIL line per kernel.

    python scripts/tpu_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_pruning_tpu.configs import deit_small
from vit_pruning_tpu.models.vit import init_vit_params, vit_layer
from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer
from vit_pruning_tpu.ops.pallas.layer_int8 import fused_vit_layer_int8
from vit_pruning_tpu.ops.quant import int8_vit_layer_ref, quantize_layer_params


def check(name, got, ref, mask=None, tol=5e-2):
    got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    if mask is not None:
        got = got * np.asarray(mask)[..., None]
        ref = ref * np.asarray(mask)[..., None]
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    print(f"{'PASS' if rel < tol else 'FAIL'} {name}: rel {rel:.5f} "
          f"(max abs {np.abs(got - ref).max():.4f})", flush=True)
    return rel < tol


def main():
    cfg = deit_small(num_labels=100)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["layers"])
    ok = True
    for s in (99, 197):
        x = jax.random.normal(jax.random.PRNGKey(1), (16, s, cfg.hidden_size), jnp.bfloat16)
        mask = jax.random.uniform(jax.random.PRNGKey(2), (16, s)) > 0.3
        mask = mask.at[:, 0].set(True)
        ref = vit_layer(x.astype(jnp.float32),
                        jax.tree.map(lambda a: a.astype(jnp.float32), lp), cfg)
        got = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps)
        ok &= check(f"staged2 bf16 S={s}", got, ref, tol=2e-2)
        refm = vit_layer(x.astype(jnp.float32),
                         jax.tree.map(lambda a: a.astype(jnp.float32), lp),
                         cfg, token_mask=mask)
        gotm = fused_vit_layer(x, lp, cfg.num_heads, eps=cfg.layernorm_eps,
                               token_mask=mask)
        ok &= check(f"staged2 bf16 masked S={s}", gotm, refm, mask=mask, tol=2e-2)

        qp = quantize_layer_params(lp)
        ref8 = int8_vit_layer_ref(x, qp, cfg)
        got8 = fused_vit_layer_int8(x, qp, cfg.num_heads, eps=cfg.layernorm_eps)
        ok &= check(f"int8 S={s}", got8, ref8, tol=2e-2)

        # CLS-epilogue fusion (last layer + final-LN + classifier, r3)
        from vit_pruning_tpu.models.vit import layer_norm
        from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_cls_logits

        lnf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["ln_f"])
        head = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["head"])
        y32 = vit_layer(x.astype(jnp.float32),
                        jax.tree.map(lambda a: a.astype(jnp.float32), lp), cfg)
        yn = layer_norm(y32, jax.tree.map(lambda a: a.astype(jnp.float32), params["ln_f"]),
                        cfg.layernorm_eps)
        ref_l = yn[:, 0] @ params["head"]["w"] + params["head"]["b"]
        got_l = fused_vit_layer_cls_logits(x, lp, lnf, head, cfg.num_heads,
                                           eps=cfg.layernorm_eps)
        ok &= check(f"cls_logits S={s}", got_l, ref_l, tol=2e-2)

        # fused bucketed mask-mode layer (r3): gather+layer+scatter in VMEM
        from vit_pruning_tpu.ops.pallas.layer import fused_vit_layer_bucketed

        kept_i = mask.astype(jnp.int32)
        counts = kept_i.sum(-1)
        kept_rank = jnp.cumsum(kept_i, axis=-1) - 1
        skip_rank = counts[:, None] + jnp.cumsum(1 - kept_i, axis=-1) - 1
        dest = jnp.where(mask, kept_rank, skip_rank)
        capb = int(np.asarray(counts).max())
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, capb, 1), 1)
        P = (dest[:, None, :] == rows).astype(jnp.float32)
        xc = jnp.einsum("brt,btd->brd", P, x.astype(jnp.float32))
        key_ok = jax.lax.broadcasted_iota(jnp.int32, (16, capb), 1) < counts[:, None]
        yc = vit_layer(xc, jax.tree.map(lambda a: a.astype(jnp.float32), lp),
                       cfg, token_mask=key_ok)
        yb = jnp.einsum("brt,brd->btd", P, yc)
        refb = jnp.where(mask[..., None], yb, x.astype(jnp.float32))
        gotb = fused_vit_layer_bucketed(x, lp, dest, mask, capb, cfg.num_heads,
                                        eps=cfg.layernorm_eps)
        ok &= check(f"bucketed S={s} cap={capb}", gotb, refb, tol=2e-2)

    # float fused embed (r3)
    from vit_pruning_tpu.models.vit import embed
    from vit_pruning_tpu.ops.pallas.embed import embed_fused

    ep = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["embed"])
    px = jax.random.normal(jax.random.PRNGKey(3), (16, 3, 224, 224), jnp.bfloat16)
    ref_e = embed(px.astype(jnp.float32),
                  jax.tree.map(lambda a: a.astype(jnp.float32), params["embed"]), cfg)
    got_e = embed_fused(px, ep, cfg)
    ok &= check("embed_fused", got_e, ref_e, tol=2e-2)
    print("ALL PASS" if ok else "SOME FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
