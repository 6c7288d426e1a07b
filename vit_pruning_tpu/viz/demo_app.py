"""Streamlit demo app (V6): upload an image, see the predicted class, the
per-layer pruning blackouts, and the skipped-patches bar chart.

Run:  streamlit run vit_pruning_tpu/viz/demo_app.py -- --checkpoint <path>

Structure mirrors interIIT/final_interiit.py (cached model load :661-680,
single-image tab with per-layer pruning images + bar chart :700-1000, batch
tab :1009-) on top of this package's explicit-mask API. Gated: streamlit is
optional; the same content is available everywhere via viz.report.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    try:
        import streamlit as st
    except ImportError:
        print(
            "streamlit is not installed; use vit_pruning_tpu.viz.report."
            "inference_report for the static-HTML demo instead.",
            file=sys.stderr,
        )
        return 1

    import numpy as np
    import jax

    from vit_pruning_tpu.configs import PruneConfig, vit_base_patch16_224
    from vit_pruning_tpu.checkpoint import restore_checkpoint
    from vit_pruning_tpu.data.preprocess import pil_preprocess
    from vit_pruning_tpu.models.pruned_vit import init_pruned_vit_params, pruned_vit_forward
    from vit_pruning_tpu.viz.blackout import blackout_montage, layer_strips, skips_per_layer_chart

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    args, _ = ap.parse_known_args(argv)

    st.set_page_config(page_title="ViT token pruning demo", layout="wide")
    st.title("Dynamic token-skip ViT — per-layer pruning demo")

    @st.cache_resource
    def load_model():
        config = vit_base_patch16_224(num_labels=100)
        pcfg = PruneConfig(mode="mask", predictor="cls_mlp")
        params = init_pruned_vit_params(jax.random.PRNGKey(0), config, pcfg)
        if args.checkpoint:
            params = restore_checkpoint(args.checkpoint, params)
        return params, config, pcfg

    params, config, pcfg = load_model()

    tab1, tab2 = st.tabs(["Single image", "Batch"])
    with tab1:
        up = st.file_uploader("Upload an image", type=["png", "jpg", "jpeg"])
        if up is not None:
            from PIL import Image

            img = Image.open(up).convert("RGB")
            x = pil_preprocess([img], size=config.image_size)
            out = pruned_vit_forward(params, x, config, pcfg)
            logits = np.asarray(out["logits"])[0]
            st.subheader(f"Predicted class: {int(logits.argmax())}")
            img224 = np.asarray(img.resize((config.image_size, config.image_size)))
            km = np.asarray(out["keep_masks"])[:, 0]
            st.pyplot(blackout_montage(img224, km, config.patch_size))
            fig, _ = skips_per_layer_chart(np.asarray(out["keep_masks"]))
            st.pyplot(fig)
            strips = layer_strips(img224, km, config.patch_size)
            st.image(strips, caption=[f"Layer {i}" for i in range(len(strips))], width=110)

    with tab2:
        ups = st.file_uploader(
            "Upload images", type=["png", "jpg", "jpeg"], accept_multiple_files=True
        )
        if ups:
            from PIL import Image

            imgs = [Image.open(u).convert("RGB") for u in ups]
            x = pil_preprocess(imgs, size=config.image_size)
            out = pruned_vit_forward(params, x, config, pcfg)
            preds = np.asarray(out["logits"]).argmax(-1)
            st.table({"image": [u.name for u in ups], "predicted class": preds.tolist()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
