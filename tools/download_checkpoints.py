"""Checkpoint downloader (analog of reference download_sam.py /
download_fastsam.py / download_dinov2.py and the MAE/PEM fetches in
feature_extraction.py:78-95 / prepare.sh).

Downloads the released torch checkpoints and converts them to flax
params via tools/convert_weights.py.  Requires network egress.
"""

from __future__ import annotations

import argparse
import os
import urllib.request

CHECKPOINTS = {
    "sam_vit_h": (
        "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth",
        "sam",
    ),
    "dinov2_vitl14": (
        "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/"
        "dinov2_vitl14_pretrain.pth",
        "dinov2",
    ),
    "mae_vit_base": (
        "https://dl.fbaipublicfiles.com/mae/pretrain/mae_pretrain_vit_base.pth",
        "mae",
    ),
    "sam6d_pem_base": (
        "https://huggingface.co/OpNet/SAM-6D/resolve/main/sam-6d-pem-base.pth",
        "pem",
    ),
    "fastsam_x": (
        "https://huggingface.co/spaces/An-619/FastSAM/resolve/main/"
        "weights/FastSAM-x.pt",
        None,  # converter rule for ultralytics layout lands in a later round
    ),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="checkpoints")
    p.add_argument(
        "--models", nargs="*", default=list(CHECKPOINTS),
        choices=list(CHECKPOINTS),
    )
    p.add_argument("--convert", action="store_true",
                   help="also convert to flax params")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.models:
        url, kind = CHECKPOINTS[name]
        dest = os.path.join(args.out_dir, os.path.basename(url))
        if not os.path.exists(dest):
            print(f"downloading {name} from {url}")
            urllib.request.urlretrieve(url, dest)
        else:
            print(f"{name}: already present")
        if args.convert and kind:
            from tools.convert_weights import (
                convert_dino_vit,
                convert_mae_vit,
                convert_pem,
                convert_sam_encoder,
                load_torch_state_dict,
            )
            from sam6d_tpu.train.checkpoint import save_params

            sd = load_torch_state_dict(dest)
            fn = {
                "mae": lambda s: {"params": convert_mae_vit(s)},
                "pem": convert_pem,
                "dinov2": lambda s: {"params": convert_dino_vit(s)},
                "sam": lambda s: {"params": convert_sam_encoder(s)},
            }[kind]
            out_path = os.path.join(args.out_dir, f"{name}_flax")
            save_params(out_path, fn(sd))
            print(f"converted -> {out_path}")


if __name__ == "__main__":
    main()
