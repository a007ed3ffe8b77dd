"""Pretrained-encoder weight manifests (VERDICT r3 missing #1).

This image has no network egress, so the ImageNet encoder weights the
reference pulls at runtime (``common_utils.py:236``: ``encoder_weights:
'imagenet'`` through timm/smp; ``Main_MMR_SegModel.py:589``) cannot be
fetched here. The conversion machinery (`models/pretrained.py`, numerically
proven against hand-written torch oracles in ``tests/test_models.py``) must
run wherever the torch checkpoints exist — this module pins down exactly
what that conversion must produce:

- :func:`build_manifest` derives the EXPECTED TREE (every leaf path, shape,
  dtype, and the total parameter count) for an encoder from the flax model
  itself — no weights needed, so the committed ``weights_manifest.json`` can
  be regenerated and diffed offline.
- :func:`verify_store` checks a converted ``<encoder>.<tag>.npz`` leaf-by-
  leaf against the manifest and returns its sha256, giving the offline
  converter a reproducible artifact fingerprint.

Workflow on a machine with network + timm/torchvision::

    python -m mmr_tpu.cli.export_weights --encoder tu-mobilenetv3_small_100
    # downloads via timm, converts, writes $MMR_TPU_WEIGHTS_DIR/*.npz,
    # verifies against weights_manifest.json, prints the sha256 line

then copy the ``.npz`` (and the printed checksum) to the TPU host;
``encoder_weights='imagenet'`` picks it up from ``$MMR_TPU_WEIGHTS_DIR``.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

MANIFEST_PATH = Path(__file__).resolve().parents[2] / "weights_manifest.json"


def _flat_shapes(tree: dict, prefix="") -> dict[str, dict]:
    out = {}
    for k, v in sorted(tree.items()):
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat_shapes(v, p))
        else:
            # works for arrays and jax.eval_shape's ShapeDtypeStructs alike
            out[p] = {"shape": list(getattr(v, "shape", np.shape(v))),
                      "dtype": str(getattr(v, "dtype", None)
                                   or np.asarray(v).dtype)}
    return out


def build_manifest(encoder_name: str) -> dict:
    """Expected converted-weight tree for one encoder: per-leaf path/shape/
    dtype for both collections, flat keys under ``params/`` and
    ``batch_stats/`` — exactly ``pretrained.save_weight_store``'s layout."""
    import jax
    import jax.numpy as jnp

    from mmr_tpu.models.encoders import get_encoder

    spec = get_encoder(encoder_name)
    enc = spec.build(jnp.float32, "encoder")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.eval_shape(
            lambda: enc.init(jax.random.key(0),
                             jnp.zeros((1, 128, 128, 3), jnp.float32),
                             train=False))
    leaves = {}
    for coll in ("params", "batch_stats"):
        if coll in variables:
            leaves.update({f"{coll}/{k}": v for k, v in
                           _flat_shapes(variables[coll]).items()})
    n_params = sum(int(np.prod(v["shape"]))
                   for k, v in leaves.items() if k.startswith("params/"))
    return {"encoder": encoder_name, "n_params": n_params, "leaves": leaves}


def write_manifest(encoders: list[str], path: Path = MANIFEST_PATH) -> dict:
    manifest = {"format": 1,
                "encoders": {e: build_manifest(e) for e in encoders}}
    path.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


def load_manifest(path: Path = MANIFEST_PATH) -> dict:
    return json.loads(Path(path).read_text())


def sha256_file(path: str | Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_store(encoder_name: str, npz_path: str | Path,
                 manifest: dict | None = None) -> dict:
    """Check a converted ``.npz`` store leaf-by-leaf against the manifest.

    Returns ``{"sha256": ..., "n_leaves": ...}``; raises ``ValueError``
    listing every missing/extra/mis-shaped leaf otherwise."""
    manifest = manifest or load_manifest()
    want = manifest["encoders"][encoder_name]["leaves"]
    with np.load(npz_path) as z:
        have = {k: {"shape": list(z[k].shape), "dtype": str(z[k].dtype)}
                for k in z.files}
    errors = []
    for k, v in want.items():
        if k not in have:
            errors.append(f"missing leaf {k} {v['shape']}")
        elif have[k]["shape"] != v["shape"]:
            errors.append(f"shape mismatch {k}: store {have[k]['shape']} "
                          f"vs manifest {v['shape']}")
    errors += [f"unexpected leaf {k}" for k in have if k not in want]
    if errors:
        raise ValueError(f"{npz_path} does not match the "
                         f"{encoder_name} manifest:\n  " + "\n  ".join(errors))
    return {"sha256": sha256_file(npz_path), "n_leaves": len(have)}
