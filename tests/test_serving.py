"""Serving path: uint8 end-to-end, progressive schedules, jit-ability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_pruning_tpu.configs import PruneConfig, vit_tiny
from vit_pruning_tpu.data.preprocess import vit_preprocess
from vit_pruning_tpu.models.pruned_vit import (
    init_pruned_vit_params,
    progressive_topk_forward,
    pruned_vit_forward,
)
from vit_pruning_tpu.serving import serving_forward

CFG = vit_tiny()


@pytest.fixture(scope="module")
def setup():
    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp", top_k=8)
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    u8 = np.random.RandomState(0).randint(
        0, 256, (2, 3, CFG.image_size, CFG.image_size), np.uint8
    )
    return pcfg, params, u8


def test_serving_matches_reference_path(setup):
    pcfg, params, u8 = setup
    x = vit_preprocess(jnp.asarray(u8.transpose(0, 2, 3, 1)), CFG.image_size)
    ref = progressive_topk_forward(params, x, CFG, pcfg, use_pallas=False)
    got = serving_forward(params, jnp.asarray(u8), CFG, pcfg,
                          use_pallas=False, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), np.asarray(ref["logits"]), atol=1e-4
    )


def test_serving_rejects_float(setup):
    pcfg, params, u8 = setup
    with pytest.raises(ValueError, match="uint8"):
        serving_forward(params, jnp.zeros((2, 3, 32, 32)), CFG, pcfg)


def test_decreasing_schedule_monotone(setup):
    pcfg = PruneConfig(mode="topk_prog", predictor="cls_mlp",
                       keep_schedule=(12, 0, 6))
    params = init_pruned_vit_params(jax.random.PRNGKey(0), CFG, pcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    out = progressive_topk_forward(params, x, CFG, pcfg, use_pallas=False)
    live = np.asarray(out["keep_masks"]).sum(-1)
    # monotone non-increasing live counts; dropped tokens never return
    assert (np.diff(live, axis=0) <= 0).all()
    assert list(live[:, 0]) == [13, 13, 7]
    # dropped positions stay dropped
    km = np.asarray(out["keep_masks"])
    assert (km[2] <= km[1]).all() and (km[1] <= km[0]).all()


def test_topk_prog_routed_via_pruned_forward(setup):
    """mode='topk_prog' through the standard entry: progressive at
    inference, per-layer re-decide under train."""
    pcfg, params, u8 = setup
    x = vit_preprocess(jnp.asarray(u8.transpose(0, 2, 3, 1)), CFG.image_size)
    serve = pruned_vit_forward(params, x, CFG, pcfg, use_pallas=False)
    ref = progressive_topk_forward(params, x, CFG, pcfg, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(serve["logits"]), np.asarray(ref["logits"]), atol=1e-6
    )
    tr = pruned_vit_forward(params, x, CFG, pcfg, train=True,
                            rng=jax.random.PRNGKey(0), use_pallas=False)
    assert "aux" in tr  # oracle instrumentation present under train


def test_export_serving_roundtrip(setup, tmp_path):
    """jax.export artifact: serialize -> reload -> bit-identical logits."""
    pcfg, params, u8 = setup
    from vit_pruning_tpu.serving import export_serving, load_exported

    path = str(tmp_path / "serving.stablehlo")
    export_serving(params, CFG, pcfg, batch_size=2, path=path,
                   use_pallas=False, interpret=True)
    call = load_exported(path)
    # compare against the JITTED direct call (the deployment usage): the
    # artifact is a compiled program, and XLA's fusion may differ from
    # eager op-by-op dispatch in the last float bits
    direct = jax.jit(lambda p, u: serving_forward(
        p, u, CFG, pcfg, use_pallas=False, interpret=True)["logits"])(
        params, jnp.asarray(u8))
    reloaded = call(params, jnp.asarray(u8))
    np.testing.assert_array_equal(np.asarray(reloaded), np.asarray(direct))
    # jittable and shape-checked
    jitted = jax.jit(call)(params, jnp.asarray(u8))
    np.testing.assert_array_equal(np.asarray(jitted), np.asarray(direct))
    with pytest.raises(Exception):
        call(params, jnp.asarray(u8[:1]))  # wrong batch -> rejected
