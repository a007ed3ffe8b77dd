"""``mmr_export_weights`` — offline pretrained-encoder converter.

Run this on a machine WITH network access and timm/torchvision installed
(the TPU image has no egress): it downloads the ImageNet checkpoint the
reference consumes at runtime (``common_utils.py:236``:
``encoder_weights='imagenet'`` via timm; ``Main_MMR_SegModel.py:589``),
converts it through the numerically-proven importer
(``models/pretrained.import_torch_state_dict``), writes the ``.npz`` store
under ``$MMR_TPU_WEIGHTS_DIR``, verifies it leaf-by-leaf against the
committed ``weights_manifest.json``, and prints a checksum line — copy the
``.npz`` to the TPU host and ``encoder_weights='imagenet'`` loads it.

timm model names per encoder (the smp TimmUniversalEncoder naming the
reference uses, minus the ``tu-`` prefix):
  tu-mobilenetv3_small_100 → mobilenetv3_small_100
  resnet18 / resnet34      → resnet18 / resnet34 (torchvision weights are
                             identical trees; timm works too)
  mit_b0 / mit_b2          → official SegFormer checkpoints
                             (state dict with patch_embedN/blockN/normN keys)
  tu-convnextv2_tiny       → convnextv2_tiny
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="download + convert ImageNet encoder weights (needs "
                    "network + timm; run OFF the TPU image)")
    parser.add_argument("--encoder", required=True,
                        help="registry name, e.g. tu-mobilenetv3_small_100")
    parser.add_argument("--timm_name", default=None,
                        help="override the timm model name (default: encoder "
                             "name minus any 'tu-' prefix)")
    parser.add_argument("--state_dict", default=None,
                        help="path to an already-downloaded torch state dict "
                             "(.pth) instead of a timm download (the only "
                             "option for mit_b*, whose official checkpoints "
                             "are not on timm's hub under these names)")
    parser.add_argument("--tag", default="imagenet")
    args = parser.parse_args(argv)

    from mmr_tpu.models.pretrained import (import_torch_state_dict,
                                           save_weight_store)
    from mmr_tpu.models.weight_manifest import sha256_file, verify_store

    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        try:
            import timm
        except ImportError:
            print("timm is not installed — pip install timm, or pass "
                  "--state_dict <checkpoint.pth>", file=sys.stderr)
            return 2
        name = args.timm_name or args.encoder.removeprefix("tu-")
        sd = timm.create_model(name, pretrained=True).state_dict()

    params, stats = import_torch_state_dict(sd, args.encoder)
    path = save_weight_store(args.encoder, params, stats, tag=args.tag)
    try:
        report = verify_store(args.encoder, path)
    except (FileNotFoundError, KeyError):
        report = {"sha256": sha256_file(path),
                  "n_leaves": "unverified (encoder not in manifest)"}
    print(json.dumps({"encoder": args.encoder, "store": str(path), **report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
