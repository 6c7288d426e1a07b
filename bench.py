"""Headline benchmark: images/sec/chip, DeiT-S at 50% token skip vs dense.

Prints ONE JSON line:
  {"metric": "deit_s_imgs_per_sec_chip_50pct_skip", "value": <img/s>,
   "unit": "img/s/chip", "vs_baseline": <speedup over dense DeiT-S>}

vs_baseline is the speedup of the pruned model over the dense DeiT-S forward
measured on the same chip in the same run (BASELINE.json north star: >= 3.0
at 50% skip). Timing forces a host transfer per iteration — on the axon
relay, block_until_ready() does not synchronize.

Extra detail (all modes/models) goes to stderr; stdout carries only the JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, args, iters: int, warmup: int = 2) -> float:
    """Median seconds/call, synchronized via host transfer."""
    for _ in range(warmup):
        np.asarray(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)  # force host transfer == real sync on axon
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


# TPU v5e (v5 lite) per-chip peak: 197 TFLOP/s bf16 (394 TOPS int8). MFU
# fields are only emitted for bf16 runs — fp32 matmuls on this MXU go
# through multi-pass emulation with no single published peak to normalize by.
PEAK_TFLOPS = {"bfloat16": 197.0}


def flops_per_image(config, pcfg=None, mlp_dim=None) -> float:
    """Analytic per-image forward FLOPs (utils/flops.py) for a bench config.

    mlp_dim: override for channel-pruned backbones (prune_mlp_channels
    halves the weights but not the config; utils/flops._layer_flops reads
    config.mlp_dim)."""
    from vit_pruning_tpu.utils.flops import pruned_vit_flops, vit_flops

    if mlp_dim is not None:
        config = config.replace(mlp_dim=mlp_dim)
    if pcfg is None:
        return vit_flops(config)
    return pruned_vit_flops(config, pcfg)


def mfu_fields(prefix: str, img_per_sec: float, flops_img: float, dtype: str) -> dict:
    """achieved-TFLOP/s + %-of-peak fields for one measured config (VERDICT
    r3 #1). 'Achieved' uses the analytic model FLOPs (matmuls only, the MXU
    convention), so it is model-FLOP utilization, not executed-op counting."""
    tfs = img_per_sec * flops_img / 1e12
    p = f"{prefix}_" if prefix else ""
    out = {f"{p}achieved_tflops": round(tfs, 2)}
    peak = PEAK_TFLOPS.get(dtype)
    if peak:
        out[f"{p}mfu"] = round(tfs / peak, 4)
    return out


def amortized(forward, inner: int):
    """Wrap a forward into `inner` sequential evaluations inside ONE jitted
    call, returning a scalar — amortizes the ~30 ms per-dispatch overhead of
    the axon relay and keeps the host transfer tiny. The input is perturbed
    per iteration so XLA cannot hoist the computation."""

    @jax.jit
    def fn(params, x):
        def body(i, acc):
            return acc + forward(params, x + i.astype(x.dtype) * 1e-6).sum()

        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=24,
                    help="forwards per jitted call — amortizes the relay's "
                         "~30 ms per-dispatch overhead (measured via a pure "
                         "copy control, scripts/kernel_lab.py)")
    ap.add_argument("--model", default="deit_small",
                    choices=["deit_tiny", "deit_small", "deit_base",
                             "vit_large", "vit_huge"])
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--skip", type=float, default=0.5)
    ap.add_argument("--kernels", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--mode", default="topk_prog",
                    choices=["topk", "topk_prog", "mask", "random"],
                    help="topk_prog = progressive compaction (serving path); "
                         "topk/mask = reference per-layer re-decide semantics; "
                         "random = M14 control — fixed per-image budget, i.e. "
                         "mask-mode execution cost at the EXACT skip rate")
    ap.add_argument("--schedule", default=None,
                    help="comma-separated per-layer patch keep counts for "
                         "topk_prog (e.g. '128,128,64,64,64,64,32,32,32,32,32,32'); "
                         "overrides --skip")
    ap.add_argument("--composed", action="store_true",
                    help="compose structured pruning (3/6 heads, 50%% MLP "
                         "channels) with the aggressive token schedule — the "
                         "3x+ configuration (accuracy trade unvalidated "
                         "without real data)")
    ap.add_argument("--ultra", action="store_true",
                    help="the ultra preset at any --model: composed "
                         "structural pruning + the deeper ultra_schedule "
                         "(gate-passing without merge — zero token delta at "
                         "gate scale, quality.py --preset ultra)")
    ap.add_argument("--merge_dropped", action="store_true",
                    help="serve topk_prog with ToMe-flavored merge "
                         "compaction (PruneConfig.merge_dropped). Measured "
                         "NEGATIVE on the synthetic gate task (background "
                         "patches are noise by construction; quality.py "
                         "--preset ultra --merge_dropped ablation) — an "
                         "option for real-data deployments, gate it there")
    ap.add_argument("--mask_budget", type=int, default=None,
                    help="mode=mask per-image density cap (PruneConfig."
                         "mask_budget): keep at most this many highest-"
                         "scoring above-threshold tokens — pins the bucketed "
                         "capacity at budget+1 (VERDICT r2 #3)")
    ap.add_argument("--mask_calibrate", action="store_true",
                    help="mode=mask: calibrate per-layer mlp_thresholds to "
                         "the per-layer median score of a probe run (the "
                         "quality.py calibration), putting every layer near "
                         "50%% density — the realistic-predictor operating "
                         "point (an untrained head at a global 0.5 threshold "
                         "has chaotic per-layer densities)")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="serving quantization for the PRUNED side (int8 "
                         "dynamic-activation weight matmuls, ops/quant.py; "
                         "the dense baseline stays in --dtype). An int8 "
                         "dense row is logged to stderr for the same-dtype "
                         "comparison")
    ap.add_argument("--serving", action="store_true",
                    help="measure the full uint8 serving path (fused embed "
                         "kernel + progressive compaction) as the pruned side")
    ap.add_argument("--token50_sweep", action="store_true",
                    help="measure EVERY token50_schedules candidate (pure "
                         "token skip at mean 50%% — the literal north-star "
                         "config, VERDICT r3 #1) against the same-run dense; "
                         "matrix to stderr + token50_sweep.json, best-"
                         "candidate JSON on stdout")
    ap.add_argument("--deep_drop_sweep", action="store_true",
                    help="measure the throughput of EXACTLY the schedules "
                         "the quality.py --margin_sweep gates (single_drop "
                         "top-k ladder + m-deep progressive family, dense "
                         "weights, no structural pruning) so every committed "
                         "accuracy row in quality_results.json::*.gate_margin "
                         "has a paired img/s row: the throughput-vs-accuracy "
                         "frontier on the task that charges for skipping. "
                         "matrix to stderr + deep_drop_sweep.json, deepest-"
                         "passing-config JSON on stdout")
    ap.add_argument("--bs_sweep", action="store_true",
                    help="batch-size throughput sweep at --model: {dense, "
                         "50%% token skip, composed, ultra} x --bs_list. "
                         "Measured at DeiT-S: FLAT from bs512 to bs2048 "
                         "(+-3.6%% — per-batch costs scale linearly; the "
                         "presets' sub-50%% MFU is small-shape MXU "
                         "efficiency, not unamortized fixed cost). matrix "
                         "to stderr + bs_sweep.json, best-ultra JSON on "
                         "stdout")
    ap.add_argument("--bs_list", default="512,1024,2048",
                    help="comma-separated batch sizes for --bs_sweep")
    ap.add_argument("--full", action="store_true",
                    help="sweep --full_models x {0,25,50}%% skip + "
                         "{composed, ultra} (SURVEY §7 step 8); "
                         "matrix to stderr + bench_full.json, headline JSON on stdout")
    ap.add_argument("--full_models",
                    default="deit_tiny,deit_small,deit_base,vit_large,vit_huge",
                    help="comma-separated model list for --full")
    args = ap.parse_args()

    try:
        # persistent compilation cache: Pallas/XLA compiles on this relay cost
        # minutes; caching makes repeat bench runs fast
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vit_pruning_tpu.configs import (
        PruneConfig,
        deit_base,
        deit_small,
        deit_tiny,
        vit_huge,
        vit_large,
    )
    from vit_pruning_tpu.models.pruned_vit import (
        init_pruned_vit_params,
        progressive_topk_forward,
        pruned_vit_forward,
    )
    from vit_pruning_tpu.models.vit import vit_forward
    from vit_pruning_tpu.ops.dispatch import set_kernel_mode

    set_kernel_mode(args.kernels)

    models = {"deit_tiny": deit_tiny, "deit_small": deit_small,
              "deit_base": deit_base, "vit_large": vit_large,
              "vit_huge": vit_huge}
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def measure(model_name: str, skip: float, mode: str,
                composed: bool = False, preset: str = "composed",
                batch: int = 0) -> dict:
        batch = batch or args.batch
        config = models[model_name](num_labels=100)
        n = config.num_patches
        params0 = init_pruned_vit_params(
            jax.random.PRNGKey(0), config,
            PruneConfig(mode="mask", predictor="cls_mlp"),
        )
        xb = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224), dtype)
        if composed:
            from vit_pruning_tpu.configs import (
                composed_schedule, schedule_live, ultra_schedule)
            from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

            csched = (ultra_schedule if preset == "ultra"
                      else composed_schedule)(n, config.num_layers)
            cpcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                                loss="mse_attention", top_k=csched[0],
                                keep_schedule=csched)
            bb, c_config = prune_heads(
                params0["backbone"], config,
                [list(range(0, config.num_heads, 2))] * config.num_layers)
            params0["backbone"] = prune_mlp_channels(
                bb, [list(range(0, config.mlp_dim, 2))] * config.num_layers)
            params0 = jax.tree.map(lambda a: a.astype(dtype), params0)
            fn = amortized(
                lambda p, v: progressive_topk_forward(
                    p, v, c_config, cpcfg, logits_only=True)["logits"],
                args.inner)
            t = timeit(fn, (params0, xb), args.iters) / args.inner
            live = [v - 1 for v in schedule_live(csched, n)]
            ips = batch / t
            return {"model": model_name, "skip": round(1.0 - sum(live) / len(live) / n, 4),
                    "mode": preset, "batch": batch,
                    "img_per_sec_chip": round(ips, 1),
                    "ms_per_batch": round(t * 1e3, 2),
                    **mfu_fields("", ips,
                                 flops_per_image(c_config, cpcfg,
                                                 mlp_dim=config.mlp_dim // 2),
                                 args.dtype)}
        params0 = jax.tree.map(lambda a: a.astype(dtype), params0)
        if skip <= 0:
            fn = amortized(
                lambda p, v: vit_forward(p["backbone"], v, config)["logits"], args.inner
            )
            t = timeit(fn, (params0, xb), args.iters) / args.inner
            pc = None
        else:
            kk = max(1, int(round(n * (1.0 - skip))))
            pc = PruneConfig(mode=mode, predictor="cls_mlp", loss="mse_attention", top_k=kk)
            if mode == "topk_prog":
                f = lambda p, v: progressive_topk_forward(
                    p, v, config, pc, logits_only=True)["logits"]
            else:
                rng_ = jax.random.PRNGKey(7) if mode == "random" else None
                f = lambda p, v: pruned_vit_forward(p, v, config, pc, rng=rng_)["logits"]
            fn = amortized(f, args.inner)
            t = timeit(fn, (params0, xb), args.iters) / args.inner
        ips = batch / t
        return {"model": model_name, "skip": skip, "mode": mode if skip > 0 else "dense",
                "batch": batch,
                "img_per_sec_chip": round(ips, 1), "ms_per_batch": round(t * 1e3, 2),
                **mfu_fields("", ips, flops_per_image(config, pc), args.dtype)}

    if args.full:
        import itertools

        # T/S/B/L/H x {dense, 25, 50, composed, ultra} in ONE command
        # (VERDICT r3 #5: the scaling rows must come out of the documented
        # matrix command, not hand-run singles)
        full_models = [m.strip() for m in args.full_models.split(",") if m.strip()]
        bad = [m for m in full_models if m not in models]
        if bad or not full_models:
            ap.error(f"--full_models: unknown model(s) {bad or ['<empty>']}; "
                     f"valid names: {', '.join(sorted(models))}")
        rows = []

        def publish():
            # atomic rewrite after EVERY row: a killed run (the ViT-H
            # pruned-config compiles are 5-8 min each) keeps its measured
            # rows instead of losing the whole sweep (r5; the r4 sweep died
            # at row 14/25 and left nothing)
            tmp = "bench_full.json.tmp"
            with open(tmp, "w") as fh:
                json.dump(rows, fh, indent=1)
                fh.write("\n")
            os.replace(tmp, "bench_full.json")

        for mname, skip in itertools.product(full_models, [0.0, 0.25, 0.5]):
            row = measure(mname, skip, args.mode)
            rows.append(row)
            log(row)
            publish()
        for mname in full_models:
            for preset in ("composed", "ultra"):
                row = measure(mname, 0.0, args.mode, composed=True, preset=preset)
                rows.append(row)
                log(row)
                publish()
        dense = next(r for r in rows if r["model"] == "deit_small" and r["skip"] == 0.0)
        half = next(r for r in rows if r["model"] == "deit_small" and r["skip"] == 0.5)
        print(json.dumps({
            "metric": "deit_small_imgs_per_sec_chip_50pct_skip",
            "value": half["img_per_sec_chip"],
            "unit": "img/s/chip",
            "vs_baseline": round(half["img_per_sec_chip"] / dense["img_per_sec_chip"], 3),
        }))
        return

    if args.bs_sweep:
        # throughput-vs-batch for the serving presets. Measured outcome
        # (bs_sweep.json, round 4): throughput is FLAT bs512-2048 within
        # +-3.6% for dense/50%/composed/ultra — the presets' sub-50% MFU is
        # small-shape MXU efficiency, not fixed-cost amortization. Kept as a
        # regression/measurement tool. Rows reuse measure(), so MFU fields
        # come along.
        try:
            bs_list = [int(v.strip()) for v in args.bs_list.split(",")
                       if v.strip()]
        except ValueError:
            ap.error(f"--bs_list: expected comma-separated ints, got "
                     f"{args.bs_list!r}")
        if not bs_list or any(b <= 0 for b in bs_list):
            ap.error(f"--bs_list: batch sizes must be positive ints, got "
                     f"{args.bs_list!r}")
        sweep_cfgs = [("dense", dict(skip=0.0)),
                      ("pruned50", dict(skip=0.5)),
                      ("composed", dict(skip=0.0, composed=True,
                                        preset="composed")),
                      ("ultra", dict(skip=0.0, composed=True,
                                     preset="ultra"))]
        rows = []
        for b in bs_list:
            for tag, kw in sweep_cfgs:
                row = measure(args.model, mode=args.mode, batch=b, **kw)
                row["config"] = tag
                rows.append(row)
                log(row)
        with open("bs_sweep.json", "w") as fh:
            json.dump({"model": args.model, "dtype": args.dtype,
                       "inner": args.inner, "rows": rows}, fh, indent=1)
            fh.write("\n")
        best = max((r for r in rows if r["config"] == "ultra"),
                   key=lambda r: r["img_per_sec_chip"])
        dense_same_b = next(r for r in rows if r["config"] == "dense"
                            and r["batch"] == best["batch"])
        print(json.dumps({
            "metric": f"{args.model}_ultra_best_batch{best['batch']}",
            "value": best["img_per_sec_chip"], "unit": "img/s/chip",
            "vs_baseline": round(best["img_per_sec_chip"]
                                 / dense_same_b["img_per_sec_chip"], 3),
        }))
        return

    if args.token50_sweep:
        from vit_pruning_tpu.configs import schedule_live, token50_schedules

        config = models[args.model](num_labels=100)
        n = config.num_patches
        params = init_pruned_vit_params(
            jax.random.PRNGKey(0), config,
            PruneConfig(mode="topk_prog", predictor="cls_mlp",
                        loss="mse_attention", top_k=n // 2))
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 3, 224, 224), dtype)
        dense = amortized(lambda p, v: vit_forward(p, v, config)["logits"], args.inner)
        t_dense = timeit(dense, (params["backbone"], x), args.iters) / args.inner
        log(f"dense: {args.batch / t_dense:.1f} img/s ({t_dense * 1e3:.2f} ms)")
        rows = []
        for name, sched in token50_schedules(n, config.num_layers).items():
            scfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                               loss="mse_attention",
                               top_k=(sched[0] or n), keep_schedule=sched)
            fn = amortized(
                lambda p, v, _c=scfg: progressive_topk_forward(
                    p, v, config, _c, logits_only=True)["logits"], args.inner)
            t = timeit(fn, (params, x), args.iters) / args.inner
            live = [v - 1 for v in schedule_live(sched, n)]
            ips = args.batch / t
            row = {"candidate": name, "schedule": list(sched),
                   "mean_live_patches": round(sum(live) / len(live), 2),
                   "mean_skip": round(1.0 - sum(live) / len(live) / n, 4),
                   "img_per_sec_chip": round(ips, 1),
                   "ms_per_batch": round(t * 1e3, 2),
                   "vs_dense": round(ips * t_dense / args.batch, 3),
                   **mfu_fields("token50", ips,
                                flops_per_image(config, scfg), args.dtype)}
            rows.append(row)
            log(row)
        with open("token50_sweep.json", "w") as fh:
            json.dump({"model": args.model, "batch": args.batch,
                       "dtype": args.dtype,
                       "dense_img_per_sec": round(args.batch / t_dense, 1),
                       "candidates": rows}, fh, indent=1)
        best = max(rows, key=lambda r: r["img_per_sec_chip"])
        print(json.dumps({
            "metric": f"{args.model}_token50_best_{best['candidate']}",
            "value": best["img_per_sec_chip"], "unit": "img/s/chip",
            "vs_baseline": best["vs_dense"],
        }))
        return

    if args.deep_drop_sweep:
        # Throughput for EXACTLY the schedules quality.margin_sweep gates
        # (same families, same ladder, dense weights): joined with the
        # committed gate_margin accuracy rows, this is the throughput-vs-
        # accuracy frontier on a task that charges for skipping — the
        # distributed-task margin shows single drops pass at depths where
        # the composed-shape deep re-decides fail (the cost is the schedule
        # SHAPE, not the skip).
        from vit_pruning_tpu.configs import schedule_live

        config = models[args.model](num_labels=100)
        n, L = config.num_patches, config.num_layers
        params = init_pruned_vit_params(
            jax.random.PRNGKey(0), config,
            PruneConfig(mode="topk_prog", predictor="cls_mlp",
                        loss="mse_attention", top_k=n // 2))
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, 3, 224, 224), dtype)
        dense = amortized(lambda p, v: vit_forward(p, v, config)["logits"],
                          args.inner)
        t_dense = timeit(dense, (params["backbone"], x), args.iters) / args.inner
        log(f"dense: {args.batch / t_dense:.1f} img/s ({t_dense * 1e3:.2f} ms)")
        # the two margin_sweep families (quality.py::margin_sweep — keep the
        # ladders in lockstep so rows join 1:1 on (family, top_k/schedule))
        cases = []
        for frac in (0.5, 0.375, 0.25, 0.1875, 0.125, 0.09,
                     0.0625, 0.045, 0.03, 0.015):
            k = max(1, int(round(n * frac)))
            cases.append(("single_drop", {"top_k": k},
                          (k,) + (0,) * (L - 1),
                          round(1.0 - (k + 1) / (n + 1), 4)))
        for m in (1, 2, 4, 8):
            sched = tuple(
                [max(1, n // (2 * m))] + [max(1, n // (6 * m))] * min(4, L - 1)
                + [max(1, n // (12 * m))] * max(0, L - 5))
            live = [v - 1 for v in schedule_live(sched, n)]
            cases.append(("progressive", {"schedule": list(sched)}, sched,
                          round(1.0 - sum(live) / len(live) / n, 4)))
        # join accuracy in from the committed gate (when present): per-row
        # top1/delta/gate_pass make the artifact self-contained
        acc_by_key = {}
        gate_section = None
        if os.path.exists("quality_results.json"):
            with open("quality_results.json") as fh:
                qr = json.load(fh)
            for name, sec in qr.items():
                if (isinstance(sec, dict) and sec.get("gate_margin")
                        and sec.get("gate_model") == args.model):
                    gate_section = name
                    for r in sec["gate_margin"]["rows"]:
                        key = (r["family"],
                               r.get("top_k") or tuple(r.get("schedule", ())))
                        acc_by_key[key] = r
        rows = []
        for family, ident, sched, skip in cases:
            scfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                               loss="mse_attention", top_k=sched[0],
                               keep_schedule=sched)
            fn = amortized(
                lambda p, v, _c=scfg: progressive_topk_forward(
                    p, v, config, _c, logits_only=True)["logits"], args.inner)
            t = timeit(fn, (params, x), args.iters) / args.inner
            live = [v - 1 for v in schedule_live(sched, n)]
            ips = args.batch / t
            row = {"family": family, **ident, "skip": skip,
                   "mean_live_patches": round(sum(live) / len(live), 2),
                   "img_per_sec_chip": round(ips, 1),
                   "ms_per_batch": round(t * 1e3, 2),
                   "vs_dense": round(ips * t_dense / args.batch, 3),
                   **mfu_fields("deep_drop", ips,
                                flops_per_image(config, scfg), args.dtype)}
            acc = acc_by_key.get(
                (family, ident.get("top_k") or tuple(ident["schedule"])))
            if acc:
                row.update(top1=acc["top1"], delta=acc["delta"],
                           gate_pass=acc["pass"])
            rows.append(row)
            log(row)
        with open("deep_drop_sweep.json", "w") as fh:
            json.dump({"model": args.model, "batch": args.batch,
                       "dtype": args.dtype,
                       "dense_img_per_sec": round(args.batch / t_dense, 1),
                       "accuracy_section": gate_section,
                       "rows": rows}, fh, indent=1)
            fh.write("\n")
        gated = [r for r in rows if r.get("gate_pass")]
        best = (max(gated, key=lambda r: r["img_per_sec_chip"]) if gated
                else max(rows, key=lambda r: r["img_per_sec_chip"]))
        print(json.dumps({
            "metric": f"{args.model}_deepest_gated_drop_k{best.get('top_k', 0)}",
            "value": best["img_per_sec_chip"], "unit": "img/s/chip",
            "vs_baseline": best["vs_dense"],
        }))
        return

    config = models[args.model](num_labels=100)

    n = config.num_patches
    k = max(1, int(round(n * (1.0 - args.skip))))
    if args.ultra:
        # ultra = composed structural pruning + the deeper schedule
        # (merge compaction only via an explicit --merge_dropped)
        args.composed = True
    if args.composed and not args.schedule:
        from vit_pruning_tpu.configs import composed_schedule, ultra_schedule

        sched_fn = ultra_schedule if args.ultra else composed_schedule
        args.schedule = ",".join(
            str(v) for v in sched_fn(n, config.num_layers))
    schedule = None
    if args.schedule:
        from vit_pruning_tpu.configs import schedule_live

        schedule = tuple(int(v) for v in args.schedule.split(","))
        live = [v - 1 for v in schedule_live(schedule, n)]  # patches only
        args.skip = 1.0 - (sum(live) / len(live)) / n
        log(f"schedule {schedule}: mean live {sum(live)/len(live):.1f}/{n} "
            f"patches = {args.skip:.1%} average skip")
    # loss is a TRAINING-time field (inert for these untrained-inference
    # timings); set it to the recipe quality.py gates the benched presets
    # with at bench scale — mse_attention for ALL of them (the
    # deit_small_224 section's headline/mask/composed serving_configs all
    # record loss='mse_attention'; bce_oracle is the 32x32 gate-model
    # recipe only and fails at 224, RESULTS.md) — so the benched
    # PruneConfig byte-matches the gated serving_config
    pcfg = PruneConfig(mode=args.mode, predictor="cls_mlp",
                       loss="mse_attention",
                       top_k=k, keep_schedule=schedule,
                       mask_budget=args.mask_budget,
                       merge_dropped=args.merge_dropped)

    log(f"model={args.model} batch={args.batch} dtype={args.dtype} "
        f"keep k={k}/{n} devices={jax.devices()}")

    params = init_pruned_vit_params(jax.random.PRNGKey(0), config, pcfg)
    # the dense baseline always uses the UNPRUNED backbone
    dense_params = jax.tree.map(lambda a: a.astype(dtype), params["backbone"])
    pruned_config = config
    if args.composed:
        from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

        keep_h = [list(range(0, config.num_heads, 2))] * config.num_layers
        bb, pruned_config = prune_heads(params["backbone"], config, keep_h)
        bb = prune_mlp_channels(
            bb, [list(range(0, config.mlp_dim, 2))] * config.num_layers
        )
        params["backbone"] = bb
        log(f"composed: heads {config.num_heads}->{pruned_config.num_heads}, "
            f"mlp {config.mlp_dim}->{config.mlp_dim // 2}, schedule {args.schedule}")
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 3, 224, 224), dtype)

    from vit_pruning_tpu.ops.dispatch import quant_mode

    def quantized(f):
        # applies at trace time (vit_layer reads the dispatch global)
        def g(p, v):
            with quant_mode(args.quant):
                return f(p, v)
        return g

    # NOTE: the dense weights are passed as jit ARGUMENTS, never closed
    # over — a closed-over device tree lowers as embedded HLO constants and
    # the relay's compile request then carries the full weight bytes
    # (vit_large: ~600 MB -> HTTP 413 "length limit exceeded")
    dense = amortized(lambda p, v: vit_forward(p, v, config)["logits"], args.inner)
    if args.serving:
        from vit_pruning_tpu.serving import serving_forward

        u8 = jax.random.randint(jax.random.PRNGKey(2), (args.batch, 3, 224, 224), 0, 256,
                                jnp.int32).astype(jnp.uint8)

        @jax.jit
        def _serving_loop(p, u8v):
            # u8v is a traced ARGUMENT (not a closure: a closed-over device
            # array would be embedded in the compile request, same 413
            # hazard as the weights)
            def body(i, acc):
                xs = (u8v + i.astype(jnp.uint8)).astype(jnp.uint8)
                return acc + serving_forward(p, xs, pruned_config, pcfg)["logits"].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, args.inner, body, jnp.zeros((), jnp.float32))

        pruned = quantized(_serving_loop)  # trace-time: quant applies here too
    elif args.mode == "topk_prog":
        pruned_fn = lambda p, v: progressive_topk_forward(
            p, v, pruned_config, pcfg, logits_only=True)["logits"]
        pruned = amortized(quantized(pruned_fn), args.inner)
    else:
        rng = jax.random.PRNGKey(7) if args.mode == "random" else None
        pruned_fn = lambda p, v: pruned_vit_forward(
            p, v, pruned_config, pcfg, rng=rng)["logits"]
        pruned = amortized(quantized(pruned_fn), args.inner)

    measured_skip = None
    if args.mode == "mask" and args.mask_calibrate:
        # per-layer median-score thresholds from one probe run (cascade drift
        # from re-thresholding upstream layers is accepted — the measured
        # density lands near 50%); probe at the timed batch shape so bucket
        # branches compile once
        probe_scores = jax.jit(
            lambda p, v: pruned_vit_forward(
                p, v, pruned_config,
                # measure_only: dense execution (no bucket-branch compiles),
                # masks/scores still computed per layer (M13 semantics)
                pcfg.replace(mlp_threshold=0.5, mask_budget=None,
                             measure_only=True))["scores"]
        )(params, x)
        mt = tuple(
            float(np.median(np.asarray(s, np.float32))) for s in probe_scores
        )
        pcfg = pcfg.replace(mlp_threshold=mt)
        log("calibrated per-layer mlp_threshold = "
            + ", ".join(f"{v:.3f}" for v in mt))
        pruned_fn = lambda p, v: pruned_vit_forward(p, v, pruned_config, pcfg)["logits"]
        pruned = amortized(quantized(pruned_fn), args.inner)
    if args.mode == "mask":
        # mask mode ignores top_k: the mask comes from thresholding the
        # (untrained) predictor, so the nominal skip label does not describe
        # the measured computation — report the actual mask density
        # probe at the SAME batch shape as the timed run: a smaller batch
        # would force fresh Pallas compiles of every bucket branch (~minutes
        # each on the relay) solely to read mask density
        probe = jax.jit(
            lambda p, v: pruned_vit_forward(p, v, pruned_config, pcfg)["keep_masks"]
        )(params, x)
        measured_skip = float(1.0 - np.asarray(probe, np.float32).mean())
        log(f"WARNING: mode=mask skip label is nominal; measured mask density "
            f"=> actual skip {measured_skip:.1%} (threshold {pcfg.mlp_threshold} "
            f"on an untrained predictor)")

    t_dense = timeit(dense, (dense_params, x), args.iters) / args.inner
    t_pruned = timeit(pruned, (params, u8 if args.serving else x),
                      args.iters) / args.inner

    dense_ips = args.batch / t_dense
    pruned_ips = args.batch / t_pruned
    log(f"dense:  {dense_ips:.1f} img/s/chip ({t_dense * 1e3:.2f} ms/batch)")
    log(f"pruned: {pruned_ips:.1f} img/s/chip ({t_pruned * 1e3:.2f} ms/batch)")
    log(f"speedup: {pruned_ips / dense_ips:.2f}x (target >= 3.0 at 50% skip)")

    result = {
        "metric": f"{args.model}_imgs_per_sec_chip_{int(args.skip * 100)}pct_skip",
        "value": round(pruned_ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(pruned_ips / dense_ips, 3),
        "dense_img_per_sec": round(dense_ips, 1),
    }
    # achieved TFLOP/s + model-FLOP utilization per config (VERDICT r3 #1);
    # analytic matmul FLOPs from utils/flops.py, v5e bf16 peak 197 TFLOP/s
    result.update(mfu_fields("dense", dense_ips, flops_per_image(config),
                             args.dtype))
    if args.mode == "mask" and measured_skip is not None:
        # mask mode's nominal config doesn't describe the executed density;
        # use the measured one (bucketed execution tracks it)
        from vit_pruning_tpu.utils.flops import pruned_vit_flops

        live = (1.0 - measured_skip) * config.seq_len
        fp_pruned = pruned_vit_flops(
            pruned_config, pcfg,
            tokens_per_layer=[live] * config.num_layers)
    else:
        fp_pruned = flops_per_image(
            pruned_config, pcfg,
            mlp_dim=config.mlp_dim // 2 if args.composed else None)
    result.update(mfu_fields("pruned", pruned_ips, fp_pruned, args.dtype))
    if args.quant != "none":
        # same-quantization dense control, so both comparisons are on record
        dense_q = amortized(
            quantized(lambda p, v: vit_forward(p, v, config)["logits"]),
            args.inner,
        )
        t_dq = timeit(dense_q, (dense_params, x), args.iters) / args.inner
        log(f"dense {args.quant}: {args.batch / t_dq:.1f} img/s/chip "
            f"({t_dq * 1e3:.2f} ms/batch); pruned-vs-dense-{args.quant} "
            f"{t_dq / t_pruned:.2f}x")
        result["quant"] = args.quant
        result["dense_same_quant_img_per_sec"] = round(args.batch / t_dq, 1)
    if measured_skip is not None:
        result["measured_skip"] = round(measured_skip, 4)

    if not args.composed and args.mode == "topk_prog" and args.model == "deit_small":
        # also record the >=3x configuration (composed structured + deep
        # schedule — accuracy budget gated by quality.py) in the same line
        from vit_pruning_tpu.configs import composed_schedule, schedule_live
        from vit_pruning_tpu.ops.structured import prune_heads, prune_mlp_channels

        csched = composed_schedule(n, config.num_layers)
        cpcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                            loss="mse_attention", top_k=csched[0],
                            keep_schedule=csched)
        cparams = init_pruned_vit_params(jax.random.PRNGKey(0), config, cpcfg)
        bb, c_config = prune_heads(cparams["backbone"], config,
                                   [list(range(0, config.num_heads, 2))] * config.num_layers)
        cparams["backbone"] = prune_mlp_channels(
            bb, [list(range(0, config.mlp_dim, 2))] * config.num_layers)
        cparams = jax.tree.map(lambda a: a.astype(dtype), cparams)
        comp = amortized(
            lambda p, v: progressive_topk_forward(
                p, v, c_config, cpcfg, logits_only=True)["logits"],
            args.inner,
        )
        t_comp = timeit(comp, (cparams, x), args.iters) / args.inner
        live = [v - 1 for v in schedule_live(csched, n)]
        log(f"composed: {args.batch / t_comp:.1f} img/s/chip "
            f"({t_comp * 1e3:.2f} ms/batch) = {t_dense / t_comp:.2f}x dense "
            f"(3/6 heads, 1/2 mlp, {1.0 - sum(live) / len(live) / n:.0%} token skip)")
        result["composed_img_per_sec"] = round(args.batch / t_comp, 1)
        result["composed_vs_dense"] = round(t_dense / t_comp, 3)
        result.update(mfu_fields(
            "composed", args.batch / t_comp,
            flops_per_image(c_config, cpcfg, mlp_dim=config.mlp_dim // 2),
            args.dtype))

        # ultra preset: same structural pruning, ~halved live token counts
        # (quality.py --preset ultra: zero token delta at gate scale). The
        # merge-compaction variant is also recorded — its gate-scale
        # accuracy ablation is NEGATIVE (quality_results.json
        # ultra_merge_gate: the synthetic task's background patches are
        # noise by construction), so it ships as a measured option, not the
        # default serving config.
        from vit_pruning_tpu.configs import ultra_schedule

        usched = ultra_schedule(n, config.num_layers)
        ulive = [v - 1 for v in schedule_live(usched, n)]
        uskip = 1.0 - sum(ulive) / len(ulive) / n
        for merge, key, tag in ((False, "ultra", "ultra"),
                                (True, "ultra_merge", "ultra+merge")):
            upcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                                loss="mse_attention", top_k=usched[0],
                                keep_schedule=usched, merge_dropped=merge)
            ultra = amortized(
                lambda p, v, _c=upcfg: progressive_topk_forward(
                    p, v, c_config, _c, logits_only=True)["logits"],
                args.inner,
            )
            t_ultra = timeit(ultra, (cparams, x), args.iters) / args.inner
            log(f"{tag}: {args.batch / t_ultra:.1f} img/s/chip "
                f"({t_ultra * 1e3:.2f} ms/batch) = {t_dense / t_ultra:.2f}x "
                f"dense (3/6 heads, 1/2 mlp, {uskip:.0%} token skip"
                f"{', merge compaction' if merge else ''})")
            result[f"{key}_img_per_sec"] = round(args.batch / t_ultra, 1)
            result[f"{key}_vs_dense"] = round(t_dense / t_ultra, 3)
            result.update(mfu_fields(
                key, args.batch / t_ultra,
                flops_per_image(c_config, upcfg, mlp_dim=config.mlp_dim // 2),
                args.dtype))

        # token50: the best PURE token-skip config at mean 50% skip (VERDICT
        # r3 #1 — the configuration the north star literally names, with no
        # head/MLP pruning). The pinned schedule (configs.token50_schedule)
        # is the sweep winner; when it is the uniform single-drop schedule it
        # traces identically to the headline config above, so the headline
        # measurement IS the token50 measurement (one timing, no recompile).
        from vit_pruning_tpu.configs import token50_schedule

        tsched = token50_schedule(n, config.num_layers)
        t50_cfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                              loss="mse_attention", top_k=(tsched[0] or n),
                              keep_schedule=tsched)
        uniform_headline = (
            tsched == tuple([k] + [0] * (config.num_layers - 1))
            and args.skip == 0.5 and not args.serving and args.quant == "none"
        )
        if uniform_headline:
            t50_ips = pruned_ips
        else:
            t50 = amortized(
                lambda p, v: progressive_topk_forward(
                    p, v, config, t50_cfg, logits_only=True)["logits"],
                args.inner)
            t50_ips = args.batch / (timeit(t50, (params, x), args.iters)
                                    / args.inner)
        t50_live = [v - 1 for v in schedule_live(tsched, n)]
        log(f"token50 (pure token skip, schedule {tsched}): "
            f"{t50_ips:.1f} img/s/chip = {t50_ips / dense_ips:.2f}x dense "
            f"(mean live {sum(t50_live) / len(t50_live):.1f}/{n} patches)")
        result["token50_img_per_sec"] = round(t50_ips, 1)
        result["token50_vs_dense"] = round(t50_ips / dense_ips, 3)
        result["token50_schedule"] = list(tsched)
        result["token50_mean_live_patches"] = round(
            sum(t50_live) / len(t50_live), 2)
        result.update(mfu_fields("token50", t50_ips,
                                 flops_per_image(config, t50_cfg), args.dtype))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
