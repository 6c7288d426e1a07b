"""Static-HTML inference demo report (V6 equivalent).

The reference ships a Streamlit app (interIIT/final_interiit.py: upload image
-> predicted class + 12 per-layer pruning images + bar chart of pruned
patches per layer). Streamlit is not available in every deployment, so the
same content is rendered to a self-contained HTML file; the interactive
Streamlit wrapper (viz/demo_app.py) reuses these pieces when streamlit is
installed.
"""

from __future__ import annotations

import base64
import io
import os
from typing import Optional, Sequence

import numpy as np


def _png_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def _img_b64(arr: np.ndarray) -> str:
    from PIL import Image

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def inference_report(
    images: Sequence[np.ndarray],
    keep_masks: np.ndarray,
    logits: np.ndarray,
    patch_size: int,
    class_names: Optional[Sequence[str]] = None,
    out_path: str = "inference_report.html",
) -> str:
    """Render predictions + per-layer blackouts + skip bar chart to HTML.

    images: B x [H, W, 3]; keep_masks: [L, B, S]; logits: [B, C].
    """
    from vit_pruning_tpu.viz.blackout import blackout_montage, skips_per_layer_chart

    logits = np.asarray(logits)
    preds = logits.argmax(-1)
    km = np.asarray(keep_masks)

    parts = [
        "<html><head><title>vit_pruning_tpu inference report</title>",
        "<style>body{font-family:sans-serif;max-width:1100px;margin:2em auto}"
        "img{max-width:100%}h2{border-bottom:1px solid #ccc}</style></head><body>",
        "<h1>Token-skip inference report</h1>",
    ]

    fig, avg_skips = skips_per_layer_chart(km)
    parts.append("<h2>Average skipped patches per layer</h2>")
    parts.append(f'<img src="data:image/png;base64,{_png_b64(fig)}"/>')

    for bi, img in enumerate(images):
        name = (
            class_names[preds[bi]] if class_names is not None else f"class {preds[bi]}"
        )
        conf = float(np.exp(logits[bi] - logits[bi].max()).max()
                     / np.exp(logits[bi] - logits[bi].max()).sum())
        parts.append(f"<h2>Image {bi}: predicted <b>{name}</b> ({conf:.1%})</h2>")
        parts.append(
            f'<img src="data:image/png;base64,{_img_b64(np.asarray(img))}" width="224"/>'
        )
        fig = blackout_montage(img, km[:, bi], patch_size)
        parts.append(f'<img src="data:image/png;base64,{_png_b64(fig)}"/>')

    parts.append(f"<p>Mean skip ratio: {100 * (1 - km[:, :, 1:].mean()):.1f}%</p>")
    parts.append("</body></html>")

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path
