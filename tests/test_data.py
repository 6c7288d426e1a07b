"""Data pipeline: preprocessing must match HF ViTImageProcessor semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_pruning_tpu.data.preprocess import pil_preprocess, vit_preprocess
from vit_pruning_tpu.data.datasets import Batches, synthetic_dataset


def test_pil_preprocess_matches_hf_processor():
    transformers = pytest.importorskip("transformers")
    from transformers import ViTImageProcessor

    proc = ViTImageProcessor()  # defaults: 224, bilinear, 1/255, mean/std 0.5
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(3)]

    ref = proc(images=imgs, return_tensors="np")["pixel_values"]
    got = pil_preprocess(imgs)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_jnp_preprocess_close_to_pil():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    ref = pil_preprocess(list(imgs))
    got = np.asarray(vit_preprocess(jnp.asarray(imgs)))
    assert got.shape == ref.shape == (2, 3, 224, 224)
    # PIL and jax bilinear upsampling agree closely but not bitwise
    assert np.abs(got - ref).mean() < 0.02
    assert np.abs(got - ref).max() < 0.5


def test_batches_shapes_and_shuffle():
    images, labels = synthetic_dataset(n=70, image_size=16, num_labels=4)
    b = Batches(images, labels, batch_size=32, image_size=16, shuffle=True, seed=3)
    batches = list(b)
    assert len(batches) == 2  # drop_last
    assert batches[0]["pixel_values"].shape == (32, 3, 16, 16)
    assert batches[0]["labels"].shape == (32,)
    # different epochs reshuffle
    first = np.asarray(list(b)[0]["labels"])
    second = np.asarray(list(b)[0]["labels"])
    assert not np.array_equal(first, second)


def test_batches_rejects_tiny_dataset():
    images, labels = synthetic_dataset(n=8, image_size=16)
    with pytest.raises(ValueError):
        Batches(images, labels, batch_size=32, image_size=16)


def test_fetch_raises_actionable_error_offline(tmp_path):
    """H6: in an egress-free/credential-free environment the fetchers fail
    with remediation instructions, not a mid-run crash; a completed fetch
    marker short-circuits."""
    import pytest

    from vit_pruning_tpu.data.fetch import fetch_imagenet_val

    try:
        fetch_imagenet_val(str(tmp_path / "inval"))
    except RuntimeError as e:
        assert "kaggle" in str(e)
    except Exception:
        # kaggle package present but no credentials/network: any clean
        # exception is acceptable; silent success offline is not
        pass
    done = tmp_path / "cached"
    done.mkdir()
    (done / ".fetch_complete").touch()
    assert fetch_imagenet_val(str(done)) == str(done)


def test_fetch_online_paths_with_fake_backends(tmp_path, monkeypatch):
    """H6 online flow, unit-tested against fake kaggle/kagglehub backends
    (the zero-egress equivalent of exercising hi_main.py:48-53,84-86):
    authenticate before download, the reference's exact dataset IDs, unzip,
    completion marker, and idempotence on the second call."""
    import sys
    import types

    from vit_pruning_tpu.data import fetch

    calls = []

    class FakeKaggleApi:
        def authenticate(self):
            calls.append(("auth",))

        def dataset_download_files(self, dataset, path, unzip):
            calls.append(("download", dataset, path, unzip))

    ext = types.ModuleType("kaggle.api.kaggle_api_extended")
    ext.KaggleApi = FakeKaggleApi
    api_pkg = types.ModuleType("kaggle.api")
    api_pkg.kaggle_api_extended = ext
    kaggle_pkg = types.ModuleType("kaggle")
    kaggle_pkg.api = api_pkg
    monkeypatch.setitem(sys.modules, "kaggle", kaggle_pkg)
    monkeypatch.setitem(sys.modules, "kaggle.api", api_pkg)
    monkeypatch.setitem(sys.modules, "kaggle.api.kaggle_api_extended", ext)

    dest = tmp_path / "inval"
    assert fetch.fetch_imagenet_val(str(dest)) == str(dest)
    assert calls == [("auth",), ("download", fetch.KAGGLE_IMAGENET_VAL, str(dest), True)]
    assert (dest / ".fetch_complete").exists()
    assert fetch.fetch_imagenet_val(str(dest)) == str(dest)
    assert len(calls) == 2  # marker short-circuits: no second download

    cache = tmp_path / "hub_cache" / "tiny-imagenet"
    cache.mkdir(parents=True)
    hub = types.ModuleType("kagglehub")
    hub_calls = []

    def dataset_download(dataset):
        hub_calls.append(dataset)
        return str(cache)

    hub.dataset_download = dataset_download
    monkeypatch.setitem(sys.modules, "kagglehub", hub)

    tdest = tmp_path / "tiny"
    assert fetch.fetch_tiny_imagenet(str(tdest)) == str(cache)
    assert hub_calls == [fetch.KAGGLEHUB_TINY_IMAGENET]
    # marker records kagglehub's RESOLVED cache path and is honored on reuse
    assert fetch.fetch_tiny_imagenet(str(tdest)) == str(cache)
    assert hub_calls == [fetch.KAGGLEHUB_TINY_IMAGENET]


def test_device_batches_matches_host_batches():
    from vit_pruning_tpu.data.datasets import Batches, DeviceBatches, synthetic_dataset

    images, labels = synthetic_dataset(n=32, image_size=16, num_labels=4)
    kw = dict(batch_size=8, image_size=16, shuffle=True, seed=3)
    hb, db = Batches(images, labels, **kw), DeviceBatches(images, labels, **kw)
    hb.set_epoch(1), db.set_epoch(1)
    for a, b in zip(hb, db):
        np.testing.assert_allclose(np.asarray(a["pixel_values"]),
                                   np.asarray(b["pixel_values"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["labels"]), np.asarray(b["labels"]))


def test_prefetch_batches_matches_inner_and_delegates():
    from vit_pruning_tpu.data.datasets import Batches, PrefetchBatches, synthetic_dataset

    images, labels = synthetic_dataset(n=64, image_size=16, num_labels=4)
    kw = dict(batch_size=16, image_size=16, shuffle=True, seed=3)
    inner, pre = Batches(images, labels, **kw), PrefetchBatches(Batches(images, labels, **kw))
    inner.set_epoch(2), pre.set_epoch(2)
    assert len(pre) == len(inner) and pre.num_samples == inner.num_samples
    got = list(pre)
    ref = list(inner)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a["pixel_values"]),
                                   np.asarray(b["pixel_values"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["labels"]), np.asarray(b["labels"]))


def test_prefetch_batches_propagates_worker_errors_and_rejects_bad_depth():
    from vit_pruning_tpu.data.datasets import PrefetchBatches

    class Boom:
        def __iter__(self):
            yield {"labels": np.zeros(2)}
            raise RuntimeError("decode failed")

    it = iter(PrefetchBatches(Boom(), depth=1))
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
    with pytest.raises(ValueError):
        PrefetchBatches(Boom(), depth=0)


def test_prefetch_batches_abandoned_iterator_releases_worker():
    """Closing/abandoning a prefetch iterator must stop its worker thread
    (the generator's finally sets the stop event) — a blocked q.put would
    otherwise pin depth+1 prefetched batches for the process lifetime."""
    import threading
    import time

    from vit_pruning_tpu.data.datasets import PrefetchBatches

    before = threading.active_count()
    src = [{"x": i} for i in range(100)]
    it = iter(PrefetchBatches(src, depth=1))
    assert next(it)["x"] == 0
    it.close()  # abandon mid-epoch -> finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == before, "prefetch worker did not exit"


def test_distributed_dataset_codeword_structure():
    """synthetic_distributed_dataset: class = a codeword over shared evidence
    cells, so single cells must be ambiguous (the property that lets the
    quality gate's margin sweep fail at deep budgets — VERDICT r3 #2)."""
    from vit_pruning_tpu.data.datasets import synthetic_distributed_dataset

    kw = dict(image_size=32, num_labels=64, seed=0, cell=4,
              signal_patches=8, vocab=2, label_noise=0.0)
    imgs, labels = synthetic_distributed_dataset(48, **kw)
    assert imgs.shape == (48, 32, 32, 3) and imgs.dtype == np.uint8
    i2, l2 = synthetic_distributed_dataset(48, **kw)
    np.testing.assert_array_equal(imgs, i2)
    np.testing.assert_array_equal(labels, l2)

    # evidence cells sit at the SAME positions for every class: variance
    # across images of the same class is ~zero inside evidence cells only
    # after removing the smooth background; instead verify cross-class
    # ambiguity at single cells — two images of different classes whose
    # evidence content agrees at >=1 shared cell position must exist
    # (vocab=2 over 64 classes guarantees heavy symbol sharing per cell).
    g = 32 // 4
    # recover the shared cell positions + per-class codes the generator used
    proto = np.random.RandomState(1234)
    cells = proto.choice(g * g, size=8, replace=False)
    proto.rand(8, 2, 4, 4, 3)  # advance past the pattern bank draw
    chosen = proto.choice(2 ** 8, size=64, replace=False)
    codes = np.stack(np.unravel_index(chosen, [2] * 8), axis=1)
    assert len({tuple(c) for c in map(tuple, codes)}) == 64  # injective
    # every cell's symbol is shared by many classes -> no cell identifies one
    for p in range(8):
        for v in range(2):
            assert (codes[:, p] == v).sum() > 1

    # too many classes for the codebook must raise
    with pytest.raises(ValueError):
        synthetic_distributed_dataset(8, num_labels=300, vocab=2,
                                      signal_patches=8)


def test_quality_build_task_distributed_routing():
    """quality.py --task distributed must build the codeword dataset (cached
    under a distinct key) and default to 8 evidence cells at any scale."""
    import argparse

    from quality import build_task
    from vit_pruning_tpu.data.datasets import synthetic_distributed_dataset

    base = dict(gate_model="gate", image_size=32, data_path=None,
                train_size=32, test_size=32, batch=16, label_noise=0.1,
                signal_patches=None)
    cfg, _, test_b = build_task(argparse.Namespace(task="distributed", **base))
    want_x, want_y = synthetic_distributed_dataset(
        32, image_size=32, num_labels=cfg.num_labels, seed=1,
        label_noise=0.1, signal_patches=8, cell=cfg.patch_size)
    # the (unshuffled) test batcher preprocesses identically for both paths;
    # pushing the raw generator output through the same batcher class proves
    # build_task routed to the distributed generator
    got = np.concatenate([np.asarray(b["pixel_values"]) for b in
                          test_b.__class__(want_x, want_y, batch_size=16,
                                           image_size=32)])
    raw = np.concatenate([np.asarray(b["pixel_values"]) for b in test_b])
    np.testing.assert_array_equal(raw, got)
