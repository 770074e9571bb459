"""Convert released torch checkpoints to this framework's flax params.

The TPU analog of the reference's model-conversion toolchain
(pem_model_convert_cpu.py, ov_convert_*.py — torch -> ONNX -> OpenVINO
IR): here the conversion is a pure tensor relayout, torch state_dict ->
flax param pytree, saved via orbax.

Supported checkpoints:
  * MAE ViT (mae_pretrain_vit_base.pth)     -> PEM feature-extraction ViT
  * SAM-6D PEM (sam-6d-pem-base.pth)        -> full PEM params+batch_stats
  * DINOv2 (dinov2_vitl14_pretrain.pth)     -> ISM descriptor ViT
  * SAM (sam_vit_h_4b8939.pth)              -> ISM segmentor
  * FastSAM (FastSAM-s.pt / FastSAM-x.pt, ultralytics layout) -> ISM
    FastSAM proposal generator

Layout rules: torch Linear (out,in) -> Dense kernel (in,out) [transpose];
torch Conv2d (out,in,kh,kw) -> flax Conv kernel (kh,kw,in,out);
LayerNorm/BatchNorm weight/bias -> scale/bias (+ batch_stats mean/var).

Usage:
  python tools/convert_weights.py --kind pem --ckpt sam-6d-pem-base.pth \
      --out checkpoints/pem_flax
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

# Allow `python tools/convert_weights.py` without installing the package.
_REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _t(x):
    return np.asarray(x)


def linear(sd, p):
    out = {"kernel": _t(sd[f"{p}.weight"]).T}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def layernorm(sd, p):
    return {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}


def conv2d(sd, p):
    out = {"kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def batchnorm(sd, p):
    params = {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}
    stats = {
        "mean": _t(sd[f"{p}.running_mean"]),
        "var": _t(sd[f"{p}.running_var"]),
    }
    return params, stats


def convert_vit_backbone(sd, prefix: str, depth: int):
    """timm/MAE-layout ViT -> sam6d_tpu.models.vit.ViT params."""
    p = (prefix + ".") if prefix else ""
    params = {
        "patch_embed": conv2d(sd, f"{p}patch_embed.proj"),
        "cls_token": _t(sd[f"{p}cls_token"]),
        "pos_embed": _t(sd[f"{p}pos_embed"]),
        "norm": layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "norm2": layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": linear(sd, f"{b}.mlp.fc1"),
                "fc2": linear(sd, f"{b}.mlp.fc2"),
            },
        }
    return params


def convert_mae_vit(sd, depth: int = 12):
    """MAE pretrain checkpoint -> ViTAE.vit params (head keys ignored)."""
    sd = {k: v for k, v in sd.items() if not k.startswith("head")}
    return convert_vit_backbone(sd, "", depth)


def convert_dino_vit(sd, depth: int = 24):
    """DINOv2 checkpoint -> models.ism.dinov2.DinoViT params."""
    params = {
        "patch_embed": conv2d(sd, "patch_embed.proj"),
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": layernorm(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "ls1": {"gamma": _t(sd[f"{b}.ls1.gamma"])},
            "norm2": layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": linear(sd, f"{b}.mlp.fc1"),
                "fc2": linear(sd, f"{b}.mlp.fc2"),
            },
            "ls2": {"gamma": _t(sd[f"{b}.ls2.gamma"])},
        }
    return params


def _attention_layer(sd, p, rpe: bool):
    """Reference (RPE)TransformerLayer -> our flattened flax layer.

    torch: {p}.attention.attention.proj_q ... {p}.attention.linear,
    {p}.attention.norm, {p}.output.{expand,squeeze,norm}
    flax: attention/{proj_q...}, linear, norm, output/{...}.
    """
    attn = {
        "proj_q": linear(sd, f"{p}.attention.attention.proj_q"),
        "proj_k": linear(sd, f"{p}.attention.attention.proj_k"),
        "proj_v": linear(sd, f"{p}.attention.attention.proj_v"),
    }
    if rpe:
        attn["proj_p"] = linear(sd, f"{p}.attention.attention.proj_p")
    return {
        "attention": attn,
        "linear": linear(sd, f"{p}.attention.linear"),
        "norm": layernorm(sd, f"{p}.attention.norm"),
        "output": {
            "expand": linear(sd, f"{p}.output.expand"),
            "squeeze": linear(sd, f"{p}.output.squeeze"),
            "norm": layernorm(sd, f"{p}.output.norm"),
        },
    }


def _geometric_transformer(sd, p):
    """blocks = (self, cross)."""
    return {
        "layers_0": _attention_layer(sd, f"{p}.layers.0", rpe=True),
        "layers_1": _attention_layer(sd, f"{p}.layers.1", rpe=False),
    }


def _linear_attention_layer(sd, p):
    """Reference LinearTransformerLayer -> flax LinearTransformerLayer."""
    return {
        "attention": {
            "proj_q": linear(sd, f"{p}.attention.attention.proj_q"),
            "proj_k": linear(sd, f"{p}.attention.attention.proj_k"),
            "proj_v": linear(sd, f"{p}.attention.attention.proj_v"),
            "scale": _t(sd[f"{p}.attention.attention.scale"]),
        },
        "linear": linear(sd, f"{p}.attention.linear"),
        "norm": layernorm(sd, f"{p}.attention.norm"),
        "output": {
            "expand": linear(sd, f"{p}.output.expand"),
            "squeeze": linear(sd, f"{p}.output.squeeze"),
            "norm": layernorm(sd, f"{p}.output.norm"),
        },
    }


def _shared_mlp(sd, p, n_layers: int):
    """pointnet2 SharedMLP (conv 1x1 + BN) -> Dense+BN stack.

    Conv2d 1x1 weight (out,in,1,1) -> Dense kernel (in,out).
    """
    params, stats = {}, {}
    for i in range(n_layers):
        w = _t(sd[f"{p}.layer{i}.conv.weight"])[:, :, 0, 0].T
        params[f"dense_{i}"] = {"kernel": w}
        bn_p, bn_s = batchnorm(sd, f"{p}.layer{i}.bn.bn")
        params[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return params, stats


def _conv_transpose_as_dense(sd, p):
    """ConvTranspose2d(k=2, s=2) -> Dense with the 2x2 block flattened
    into channels (column order (a, b, out) matching ViTAE's deconv
    branch; ConvTranspose lowers at ~1% MXU on TPU, see sam/decoder.py).

    torch weight layout: (in, out, kH, kW)."""
    w = _t(sd[f"{p}.weight"])
    kernel = w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    bias = _t(sd[f"{p}.bias"])
    return {"kernel": kernel, "bias": np.tile(bias, 4)}


def _deconv_upscaling(sd, prefix):
    """Reference ViT_AE deconv head (feature_extraction.py:66-74):
    Sequential(ConvT(4D->2C), LayerNorm2d, GELU, ConvT(2C->C)) ->
    ViTAE's block-channel Dense params."""
    return {
        "upscale_deconv1": _conv_transpose_as_dense(sd, f"{prefix}.0"),
        "upscale_ln": {
            "scale": _t(sd[f"{prefix}.1.weight"]),
            "bias": _t(sd[f"{prefix}.1.bias"]),
        },
        "upscale_deconv2": _conv_transpose_as_dense(sd, f"{prefix}.3"),
    }


def convert_pem(sd, nblock_coarse: int = 3, nblock_fine: int = 3,
                vit_depth: int = 12):
    """Full SAM-6D PEM checkpoint -> {"params", "batch_stats"}."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}

    fe_vit = convert_vit_backbone(
        {k[len("feature_extraction.rgb_net.vit."):]: v
         for k, v in sd.items()
         if k.startswith("feature_extraction.rgb_net.vit.")},
        "", vit_depth,
    )
    up_prefix = "feature_extraction.rgb_net.output_upscaling"
    if f"{up_prefix}.0.weight" in sd:  # deconv variant (Sequential)
        rgb_net = {"vit": fe_vit, **_deconv_upscaling(sd, up_prefix)}
    else:
        rgb_net = {"vit": fe_vit, "output_upscaling": linear(sd, up_prefix)}
    params = {
        "feature_extraction": {
            "rgb_net": rgb_net,
        },
        "geo_embedding": {
            "proj_d": linear(sd, "geo_embedding.proj_d"),
            "proj_a": linear(sd, "geo_embedding.proj_a"),
        },
    }

    coarse = {
        "in_proj": linear(sd, "coarse_point_matching.in_proj"),
        "out_proj": linear(sd, "coarse_point_matching.out_proj"),
        "bg_token": _t(sd["coarse_point_matching.bg_token"]),
    }
    for i in range(nblock_coarse):
        coarse[f"transformers_{i}"] = _geometric_transformer(
            sd, f"coarse_point_matching.transformers.{i}"
        )
    params["coarse_point_matching"] = coarse

    fine = {
        "in_proj": linear(sd, "fine_point_matching.in_proj"),
        "out_proj": linear(sd, "fine_point_matching.out_proj"),
        "bg_token": _t(sd["fine_point_matching.bg_token"]),
    }
    stats = {"fine_point_matching": {"PE": {}}}
    pe_params = {}
    for mlp in ("mlp1", "mlp2"):
        p_, s_ = _shared_mlp(sd, f"fine_point_matching.PE.{mlp}", 3)
        pe_params[mlp] = p_
        stats["fine_point_matching"]["PE"][mlp] = s_
    w3 = _t(sd["fine_point_matching.PE.mlp3.conv.weight"])[:, :, 0].T
    pe_params["mlp3"] = {
        "kernel": w3,
        "bias": _t(sd["fine_point_matching.PE.mlp3.conv.bias"]),
    }
    fine["PE"] = pe_params
    for i in range(nblock_fine):
        b = f"fine_point_matching.transformers.{i}"
        fine[f"transformers_{i}"] = {
            "sparse_layer": _geometric_transformer(sd, f"{b}.sparse_layer"),
            "dense_layer": _linear_attention_layer(sd, f"{b}.dense_layer"),
        }
    params["fine_point_matching"] = fine
    return {"params": params, "batch_stats": stats}


def _conv_block(sd, p):
    """ultralytics Conv (conv+BN+SiLU) -> ConvBNSiLU params/batch_stats."""
    params = {"conv": {"kernel": _t(sd[f"{p}.conv.weight"]).transpose(2, 3, 1, 0)}}
    bn_p, bn_s = batchnorm(sd, f"{p}.bn")
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def _c2f_block(sd, p):
    """ultralytics C2f -> our C2f; bottleneck count detected from keys."""
    params, stats = {}, {}
    for name in ("cv1", "cv2"):
        params[name], stats[name] = _conv_block(sd, f"{p}.{name}")
    i = 0
    while f"{p}.m.{i}.cv1.conv.weight" in sd:
        sub_p, sub_s = {}, {}
        for name in ("cv1", "cv2"):
            sub_p[name], sub_s[name] = _conv_block(sd, f"{p}.m.{i}.{name}")
        params[f"m_{i}"], stats[f"m_{i}"] = sub_p, sub_s
        i += 1
    return params, stats


def convert_fastsam(sd):
    """ultralytics YOLOv8-seg / FastSAM state dict (model.N.* keys) ->
    models.ism.fastsam.YOLOv8Seg variables.

    Index map: sam6d_tpu.models.ism.fastsam.FASTSAM_LAYER_MAP (the
    yolov8-seg.yaml module order); model.22 is the Segment head. The DFL
    conv (fixed arange weights) is dropped — decode_boxes computes the
    softmax-bin expectation directly.
    """
    from sam6d_tpu.models.ism.fastsam import FASTSAM_LAYER_MAP

    # Normalize "model.model.N.*" / "model.N.*" keys to "N.*".
    def strip(k):
        while k.startswith("model."):
            k = k[len("model."):]
        return k

    sd = {strip(k): v for k, v in sd.items()}

    params, stats = {}, {}
    for idx, name in FASTSAM_LAYER_MAP.items():
        p = str(idx)
        if f"{p}.m.0.cv1.conv.weight" in sd:
            params[name], stats[name] = _c2f_block(sd, p)
        elif f"{p}.cv1.conv.weight" in sd:  # SPPF
            sub_p, sub_s = {}, {}
            for n2 in ("cv1", "cv2"):
                sub_p[n2], sub_s[n2] = _conv_block(sd, f"{p}.{n2}")
            params[name], stats[name] = sub_p, sub_s
        else:
            params[name], stats[name] = _conv_block(sd, p)

    h = "22"
    for tname, fname in (("cv1", "proto_cv1"), ("cv2", "proto_cv2"),
                         ("cv3", "proto_cv3")):
        params[fname], stats[fname] = _conv_block(sd, f"{h}.proto.{tname}")
    # torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose
    # (kh,kw,in,out) with spatial flip (verified empirically).
    up_w = _t(sd[f"{h}.proto.upsample.weight"]).transpose(2, 3, 0, 1)
    params["proto_up"] = {
        "kernel": np.ascontiguousarray(up_w[::-1, ::-1]),
        "bias": _t(sd[f"{h}.proto.upsample.bias"]),
    }
    for i in range(3):
        for branch, fname in (("cv2", "box"), ("cv3", "cls"), ("cv4", "mask")):
            for j in range(2):
                params[f"head_{fname}{j + 1}_{i}"], \
                    stats[f"head_{fname}{j + 1}_{i}"] = _conv_block(
                        sd, f"{h}.{branch}.{i}.{j}")
            params[f"head_{fname}3_{i}"] = conv2d(sd, f"{h}.{branch}.{i}.2")
    return {"params": params, "batch_stats": stats}


def convert_sam_encoder(sd, depth: int = 32):
    """SAM checkpoint (image_encoder.* keys) -> ImageEncoderViT params."""
    p = "image_encoder."
    params = {
        "patch_embed": conv2d(sd, f"{p}patch_embed.proj"),
        "pos_embed": _t(sd[f"{p}pos_embed"]),
        "neck_0": {"kernel": _t(sd[f"{p}neck.0.weight"]).transpose(2, 3, 1, 0)},
        "neck_1": {
            "weight": _t(sd[f"{p}neck.1.weight"]),
            "bias": _t(sd[f"{p}neck.1.bias"]),
        },
        "neck_2": {"kernel": _t(sd[f"{p}neck.2.weight"]).transpose(2, 3, 1, 0)},
        "neck_3": {
            "weight": _t(sd[f"{p}neck.3.weight"]),
            "bias": _t(sd[f"{p}neck.3.bias"]),
        },
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        blk = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "norm2": layernorm(sd, f"{b}.norm2"),
            "mlp_lin1": linear(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": linear(sd, f"{b}.mlp.lin2"),
        }
        if f"{b}.attn.rel_pos_h" in sd:
            blk["attn"]["rel_pos_h"] = _t(sd[f"{b}.attn.rel_pos_h"])
            blk["attn"]["rel_pos_w"] = _t(sd[f"{b}.attn.rel_pos_w"])
        params[f"blocks_{i}"] = blk
    return params


def convert_sam_prompt(sd):
    """SAM checkpoint (prompt_encoder.* keys) -> PromptEncoder params:
    point/corner embeddings, the no-mask dense embedding, AND the
    mask_downscaling conv stack (torch Conv2d (out, in, kh, kw) ->
    Conv2x2Down (kh, kw, in, out); the 1x1 conv index 6 becomes a Dense
    (in, out) kernel) — full prompt-encoder checkpoint compat
    (reference prompt_encoder.py:16)."""
    p = "prompt_encoder."
    params = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": _t(
                sd[f"{p}pe_layer.positional_encoding_gaussian_matrix"]
            ),
        },
        "not_a_point_embed": _t(sd[f"{p}not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd[f"{p}no_mask_embed.weight"]),
    }
    for i in range(4):
        params[f"point_embed_{i}"] = _t(
            sd[f"{p}point_embeddings.{i}.weight"]
        )
    for i in (0, 3):
        w = _t(sd[f"{p}mask_downscaling.{i}.weight"])  # (O, I, 2, 2)
        params[f"mask_downscaling_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{p}mask_downscaling.{i}.bias"]),
        }
    for i in (1, 4):
        params[f"mask_downscaling_{i}"] = {
            "weight": _t(sd[f"{p}mask_downscaling.{i}.weight"]),
            "bias": _t(sd[f"{p}mask_downscaling.{i}.bias"]),
        }
    w6 = _t(sd[f"{p}mask_downscaling.6.weight"])  # (O, I, 1, 1)
    params["mask_downscaling_6"] = {
        "kernel": w6[:, :, 0, 0].T,
        "bias": _t(sd[f"{p}mask_downscaling.6.bias"]),
    }
    return params


def _cross_attention(sd, p):
    return {
        name: linear(sd, f"{p}.{name}")
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


def _conv_transpose_2x2(sd, p):
    """torch ConvTranspose2d (in, out, kh, kw) -> ConvTranspose2x2
    (kh, kw, in, out).  NO spatial flip: ConvTranspose2x2 implements
    torch's (un-flipped) semantics directly, unlike flax
    nn.ConvTranspose (see sam/decoder.py)."""
    return {
        "kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 0, 1),
        "bias": _t(sd[f"{p}.bias"]),
    }


def _mlp(sd, p, n_layers):
    return {
        f"layers_{i}": linear(sd, f"{p}.layers.{i}") for i in range(n_layers)
    }


def convert_sam_decoder(sd, depth: int = 2, num_mask_tokens: int = 4):
    """SAM checkpoint (mask_decoder.* keys) -> MaskDecoder params."""
    p = "mask_decoder."
    tr = {}
    for i in range(depth):
        b = f"{p}transformer.layers.{i}"
        tr[f"layers_{i}"] = {
            "self_attn": _cross_attention(sd, f"{b}.self_attn"),
            "cross_attn_token_to_image": _cross_attention(
                sd, f"{b}.cross_attn_token_to_image"
            ),
            "cross_attn_image_to_token": _cross_attention(
                sd, f"{b}.cross_attn_image_to_token"
            ),
            "mlp_lin1": linear(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": linear(sd, f"{b}.mlp.lin2"),
            **{f"norm{j}": layernorm(sd, f"{b}.norm{j}") for j in (1, 2, 3, 4)},
        }
    tr["final_attn_token_to_image"] = _cross_attention(
        sd, f"{p}transformer.final_attn_token_to_image"
    )
    tr["norm_final_attn"] = layernorm(sd, f"{p}transformer.norm_final_attn")

    params = {
        "iou_token": _t(sd[f"{p}iou_token.weight"]),
        "mask_tokens": _t(sd[f"{p}mask_tokens.weight"]),
        "transformer": tr,
        "output_upscaling_0": _conv_transpose_2x2(sd, f"{p}output_upscaling.0"),
        "output_upscaling_1": {
            "weight": _t(sd[f"{p}output_upscaling.1.weight"]),
            "bias": _t(sd[f"{p}output_upscaling.1.bias"]),
        },
        "output_upscaling_3": _conv_transpose_2x2(sd, f"{p}output_upscaling.3"),
        "iou_prediction_head": _mlp(sd, f"{p}iou_prediction_head", 3),
    }
    for i in range(num_mask_tokens):
        params[f"output_hypernetworks_mlps_{i}"] = _mlp(
            sd, f"{p}output_hypernetworks_mlps.{i}", 3
        )
    return params


def convert_sam(sd, depth: int = 32):
    """Full SAM checkpoint -> {encoder, prompt, decoder} variables
    matching sam6d_tpu.models.ism.sam.model.SAM.variables."""
    return {
        "encoder": {"params": convert_sam_encoder(sd, depth)},
        "prompt": {"params": convert_sam_prompt(sd)},
        "decoder": {"params": convert_sam_decoder(sd)},
    }


def _walk_module_dict(obj, prefix="") -> dict:
    """Extract a state dict from a pickled nn.Module object graph without
    the defining package (e.g. ultralytics) being importable: plain-object
    stubs keep the _parameters/_buffers/_modules dicts in __dict__."""
    d = getattr(obj, "__dict__", None) or {}
    out = {}
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = b
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            out.update(_walk_module_dict(m, prefix + name + "."))
    return out


def _torch_load_with_stubs(path: str):
    """torch.load that fabricates stub classes for unimportable modules
    (ultralytics FastSAM checkpoints pickle whole model objects)."""
    import pickle
    import types

    import torch

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (), {})

    shim = types.ModuleType("stub_pickle")
    shim.Unpickler = StubUnpickler
    shim.load = pickle.load
    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=shim)


def load_torch_state_dict(path: str) -> dict:
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        ckpt = _torch_load_with_stubs(path)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict", "model_state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    # ultralytics checkpoints store the module itself under "model".
    if not isinstance(ckpt, dict):
        if isinstance(ckpt, torch.nn.Module):
            ckpt = ckpt.float().state_dict()
        else:  # stub-unpickled object graph
            ckpt = _walk_module_dict(ckpt)
    return {k: v.detach().float().numpy() if hasattr(v, "detach")
            else np.asarray(v)
            for k, v in ckpt.items() if hasattr(v, "numpy")}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["mae", "pem", "dinov2", "sam", "fastsam"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    sd = load_torch_state_dict(args.ckpt)
    if args.kind == "mae":
        out = {"params": convert_mae_vit(sd)}
    elif args.kind == "pem":
        out = convert_pem(sd)
    elif args.kind == "dinov2":
        out = {"params": convert_dino_vit(sd)}
    elif args.kind == "fastsam":
        out = convert_fastsam(sd)
    else:
        depth = 32 if any("blocks.31." in k for k in sd) else (
            24 if any("blocks.23." in k for k in sd) else 12
        )
        out = convert_sam(sd, depth)

    from sam6d_tpu.train.checkpoint import save_params

    save_params(args.out, out)
    print(f"saved converted params to {args.out}")


if __name__ == "__main__":
    main()
