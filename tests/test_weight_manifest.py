"""Weight-manifest tests (VERDICT r3 missing #1: the offline-converter
story needs a committed, verifiable fingerprint of the exact trees)."""

import numpy as np
import pytest

from mmr_tpu.models.weight_manifest import (build_manifest, load_manifest,
                                            verify_store)


def test_committed_manifest_matches_models():
    """The committed weights_manifest.json is regenerable from the flax
    models: leaf paths, shapes and param counts agree (mbv3 is the flagship
    encoder; mit_b2/convnextv2 are the PKG-INFO Example 2/3 encoders)."""
    m = load_manifest()
    for enc in ("tu-mobilenetv3_small_100", "mit_b2"):
        fresh = build_manifest(enc)
        assert m["encoders"][enc]["leaves"] == fresh["leaves"]
        assert m["encoders"][enc]["n_params"] == fresh["n_params"]
    assert m["encoders"]["tu-mobilenetv3_small_100"]["n_params"] == 927008


def test_verify_store_roundtrip(tmp_path, monkeypatch, rng):
    """A store written by save_weight_store verifies against the manifest
    (and a corrupted one is rejected with a named leaf)."""
    import jax
    import jax.numpy as jnp

    from mmr_tpu.models.encoders import get_encoder
    from mmr_tpu.models.pretrained import save_weight_store

    monkeypatch.setenv("MMR_TPU_WEIGHTS_DIR", str(tmp_path))
    enc = get_encoder("resnet18").build(jnp.float32, "encoder")
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    path = save_weight_store("resnet18", variables["params"],
                             variables["batch_stats"])
    report = verify_store("resnet18", path)
    assert len(report["sha256"]) == 64
    assert report["n_leaves"] == 100

    # corrupt: drop a leaf
    flat = dict(np.load(path))
    key = sorted(flat)[0]
    del flat[key]
    np.savez(path, **flat)
    with pytest.raises(ValueError, match="missing leaf"):
        verify_store("resnet18", path)
