"""Weight-conversion parity: tiny torch models with checkpoint-layout
names are converted to flax params and must produce matching forwards.

No released checkpoints can be downloaded in this environment, so the
tests construct torch modules with exactly the reference state-dict
naming (timm ViT / PEM transformer / pointnet2 SharedMLP) and verify
torch-vs-flax output parity after conversion — the same oracle pattern as
the reference's ov_op_test torch-vs-OpenVINO comparisons.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_weights import (  # noqa: E402
    _attention_layer,
    _shared_mlp,
    convert_vit_backbone,
)


class TorchPatchEmbed(tnn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, stride=patch)


class TorchAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, H, C // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) / (C // H) ** 0.5
        attn = attn.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return self.proj(out)


class TorchMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchViT(tnn.Module):
    """timm/MAE-layout tiny ViT matching sam6d_tpu.models.vit.ViT."""

    def __init__(self, patch=8, dim=32, depth=4, heads=4, img=32):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = TorchPatchEmbed(patch, dim)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x)  # (B, D, h, w)
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        taps = []
        d = len(self.blocks)
        n = d // 4
        idx = [d - 1, d - n - 1, d - 2 * n - 1, d - 3 * n - 1]
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in idx:
                taps.append(self.norm(x))
        return taps


class TestViTConversion:
    def test_forward_parity(self, rng):
        from sam6d_tpu.models.vit import ViT

        tmodel = TorchViT().eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        params = convert_vit_backbone(sd, "", 4)

        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            want = [
                t.numpy()
                for t in tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
            ]
        jmodel = ViT(patch_size=8, embed_dim=32, depth=4, num_heads=4,
                     img_size=32)
        got = jmodel.apply({"params": params}, jnp.asarray(x))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, atol=2e-5)


class TorchMHA(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.proj_q = tnn.Linear(dim, dim)
        self.proj_k = tnn.Linear(dim, dim)
        self.proj_v = tnn.Linear(dim, dim)

    def forward(self, q_in, k_in, v_in):
        B, N, C = q_in.shape
        H = self.num_heads
        q = self.proj_q(q_in).reshape(B, N, H, C // H)
        k = self.proj_k(k_in).reshape(B, -1, H, C // H)
        v = self.proj_v(v_in).reshape(B, -1, H, C // H)
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) / (C // H) ** 0.5
        a = a.softmax(-1)
        return torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)


class TorchAttentionLayer(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.attention = TorchMHA(dim, heads)
        self.linear = tnn.Linear(dim, dim)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x, mem):
        h = self.attention(x, mem, mem)
        return self.norm(self.linear(h) + x)


class TorchAttentionOutput(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.expand = tnn.Linear(dim, dim * 2)
        self.squeeze = tnn.Linear(dim * 2, dim)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(
            x + self.squeeze(torch.relu(self.expand(x)))
        )


class TorchTransformerLayer(tnn.Module):
    """Reference TransformerLayer naming: attention.attention.proj_q."""

    def __init__(self, dim=32, heads=4):
        super().__init__()
        self.attention = TorchAttentionLayer(dim, heads)
        self.output = TorchAttentionOutput(dim)

    def forward(self, x, mem):
        return self.output(self.attention(x, mem))


class TestTransformerLayerConversion:
    def test_forward_parity(self, rng):
        from sam6d_tpu.models.pem.transformer import TransformerLayer

        torch.manual_seed(0)  # unseeded init made the atol flaky
        tmodel = TorchTransformerLayer().eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        # _attention_layer joins "{prefix}.{name}"; give it a prefix.
        params = _attention_layer(
            {f"x.{k}": v for k, v in sd.items()}, "x", rpe=False
        )

        x = rng.rand(2, 10, 32).astype(np.float32)
        mem = rng.rand(2, 7, 32).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(x), torch.tensor(mem)).numpy()
        jmodel = TransformerLayer(32, 4)
        got = jmodel.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(mem)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TorchSharedMLP(tnn.Module):
    """pointnet2 SharedMLP naming: layer{i}.conv / layer{i}.bn.bn."""

    def __init__(self, channels=(6, 8, 16, 32)):
        super().__init__()
        for i in range(len(channels) - 1):
            conv = tnn.Conv2d(channels[i], channels[i + 1], 1, bias=False)
            bn_holder = tnn.Sequential()
            bn_holder.add_module("bn", tnn.BatchNorm2d(channels[i + 1]))
            layer = tnn.Sequential()
            layer.add_module("conv", conv)
            layer.add_module("bn", bn_holder)
            layer.add_module("relu", tnn.ReLU())
            self.add_module(f"layer{i}", layer)

    def forward(self, x):
        for i in range(3):
            x = getattr(self, f"layer{i}")(x)
        return x


class TestSharedMLPConversion:
    def test_forward_parity(self, rng):
        from sam6d_tpu.models.pem.matching import SharedMLP

        tmodel = TorchSharedMLP().eval()
        # Randomize BN stats so the test is non-trivial.
        with torch.no_grad():
            for i in range(3):
                bn = getattr(tmodel, f"layer{i}").bn.bn
                bn.running_mean.uniform_(-0.5, 0.5)
                bn.running_var.uniform_(0.5, 1.5)
        sd = {f"m.{k}": v.detach().numpy()
              for k, v in tmodel.state_dict().items()}
        params, stats = _shared_mlp(sd, "m", 3)

        x = rng.rand(2, 6, 12, 5).astype(np.float32)  # (B, C, np, ns)
        with torch.no_grad():
            want = tmodel(torch.tensor(x)).numpy()
        jmodel = SharedMLP([8, 16, 32])
        got = jmodel.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
        )


# ---------------------------------------------------------------------------
# SAM prompt encoder + mask decoder conversion (torch oracle faithful to
# reference segment_anything/modeling/{prompt_encoder,mask_decoder,
# transformer}.py with checkpoint state-dict naming).
# ---------------------------------------------------------------------------


class TorchSamCrossAttention(tnn.Module):
    def __init__(self, dim=256, heads=8, downsample_rate=1):
        super().__init__()
        internal = dim // downsample_rate
        self.num_heads = heads
        self.q_proj = tnn.Linear(dim, internal)
        self.k_proj = tnn.Linear(dim, internal)
        self.v_proj = tnn.Linear(dim, internal)
        self.out_proj = tnn.Linear(internal, dim)

    def _sep(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(1, 2)

    def forward(self, q, k, v):
        q = self._sep(self.q_proj(q))
        k = self._sep(self.k_proj(k))
        v = self._sep(self.v_proj(v))
        attn = (q @ k.transpose(2, 3)) / (q.shape[-1] ** 0.5)
        attn = torch.softmax(attn, dim=-1)
        out = (attn @ v).transpose(1, 2).flatten(2)
        return self.out_proj(out)


class TorchTwoWayBlock(tnn.Module):
    def __init__(self, dim=256, heads=8, mlp_dim=2048, skip_first_pe=False):
        super().__init__()
        self.skip_first_pe = skip_first_pe
        self.self_attn = TorchSamCrossAttention(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = TorchSamCrossAttention(dim, heads, 2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.lin1 = tnn.Linear(dim, mlp_dim)
        self.mlp.lin2 = tnn.Linear(mlp_dim, dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = TorchSamCrossAttention(dim, heads, 2)
        self.norm4 = tnn.LayerNorm(dim)

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(
                queries + query_pe, keys + key_pe, keys)
        )
        queries = self.norm3(
            queries + self.mlp.lin2(torch.relu(self.mlp.lin1(queries)))
        )
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(
                keys + key_pe, queries + query_pe, queries)
        )
        return queries, keys


class TorchLayerNorm2d(tnn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(c))
        self.bias = tnn.Parameter(torch.randn(c))
        self.eps = eps

    def forward(self, x):  # (B, C, H, W)
        mu = x.mean(1, keepdim=True)
        var = ((x - mu) ** 2).mean(1, keepdim=True)
        x = (x - mu) / torch.sqrt(var + self.eps)
        return x * self.weight[:, None, None] + self.bias[:, None, None]


class TorchMaskDecoder(tnn.Module):
    """Reference mask_decoder.py:16 + transformer.py:16, ckpt naming."""

    def __init__(self, dim=256, heads=8, mlp_dim=2048, n_mask_tokens=4):
        super().__init__()
        self.transformer = tnn.Module()
        self.transformer.layers = tnn.ModuleList(
            [TorchTwoWayBlock(dim, heads, mlp_dim, skip_first_pe=(i == 0))
             for i in range(2)]
        )
        self.transformer.final_attn_token_to_image = TorchSamCrossAttention(
            dim, heads, 2)
        self.transformer.norm_final_attn = tnn.LayerNorm(dim)
        self.iou_token = tnn.Embedding(1, dim)
        self.mask_tokens = tnn.Embedding(n_mask_tokens, dim)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(dim, dim // 4, 2, stride=2),
            TorchLayerNorm2d(dim // 4),
            tnn.GELU(),
            tnn.ConvTranspose2d(dim // 4, dim // 8, 2, stride=2),
            tnn.GELU(),
        )
        self.output_hypernetworks_mlps = tnn.ModuleList()
        for _ in range(n_mask_tokens):
            m = tnn.Module()
            m.layers = tnn.ModuleList(
                [tnn.Linear(dim, dim), tnn.Linear(dim, dim),
                 tnn.Linear(dim, dim // 8)]
            )
            self.output_hypernetworks_mlps.append(m)
        self.iou_prediction_head = tnn.Module()
        self.iou_prediction_head.layers = tnn.ModuleList(
            [tnn.Linear(dim, 256), tnn.Linear(256, 256),
             tnn.Linear(256, n_mask_tokens)]
        )
        self.n_mask_tokens = n_mask_tokens

    def forward(self, image_emb, image_pe, sparse_prompt, dense_prompt):
        # image_emb/image_pe/dense_prompt: (B, C, h, w); sparse: (B, N, C)
        B, C, h, w = image_emb.shape
        tok = torch.cat([self.iou_token.weight, self.mask_tokens.weight], 0)
        tokens = torch.cat(
            [tok.unsqueeze(0).expand(B, -1, -1), sparse_prompt], dim=1)
        src = image_emb + dense_prompt
        keys = src.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1).expand(B, -1, -1)
        queries = tokens
        for layer in self.transformer.layers:
            queries, keys = layer(queries, keys, tokens, key_pe)
        queries = self.transformer.norm_final_attn(
            queries + self.transformer.final_attn_token_to_image(
                queries + tokens, keys + key_pe, keys)
        )
        iou_out = queries[:, 0]
        mask_tok_out = queries[:, 1:1 + self.n_mask_tokens]
        src = keys.permute(0, 2, 1).reshape(B, C, h, w)
        up = self.output_upscaling(src)
        hyper = torch.stack(
            [mlp.layers[2](torch.relu(mlp.layers[1](torch.relu(
                mlp.layers[0](mask_tok_out[:, i])))))
             for i, mlp in enumerate(self.output_hypernetworks_mlps)], dim=1)
        masks = torch.einsum("btc,bcyx->btyx", hyper, up)
        x = iou_out
        for i, lin in enumerate(self.iou_prediction_head.layers):
            x = lin(x) if i == 2 else torch.relu(lin(x))
        return masks, x


class TestSamDecoderConversion:
    def test_forward_parity(self, rng):
        from tools.convert_weights import convert_sam_decoder
        from sam6d_tpu.models.ism.sam.decoder import MaskDecoder

        torch.manual_seed(0)
        tmodel = TorchMaskDecoder().eval()
        sd = {f"mask_decoder.{k}": v for k, v in tmodel.state_dict().items()}
        params = convert_sam_decoder(sd)

        B, h, w, C = 2, 8, 8, 256
        emb = rng.randn(B, C, h, w).astype(np.float32) * 0.1
        pe = rng.randn(1, C, h, w).astype(np.float32) * 0.1
        sparse = rng.randn(B, 3, C).astype(np.float32) * 0.1
        dense = rng.randn(B, C, h, w).astype(np.float32) * 0.1

        with torch.no_grad():
            masks_t, iou_t = tmodel(
                torch.from_numpy(emb), torch.from_numpy(pe),
                torch.from_numpy(sparse), torch.from_numpy(dense))

        fmodel = MaskDecoder()
        masks_f, iou_f = fmodel.apply(
            {"params": params},
            jnp.asarray(emb.transpose(0, 2, 3, 1)),
            jnp.asarray(pe.transpose(0, 2, 3, 1)),
            jnp.asarray(sparse),
            jnp.asarray(dense.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(masks_f), masks_t.numpy(), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(iou_f), iou_t.numpy(), atol=2e-4, rtol=1e-3)


def _prompt_sd(dim=256, mask_in_chans=16):
    """Synthetic prompt_encoder.* state dict at the reference layout
    (prompt_encoder.py:16), incl. the mask_downscaling conv stack."""
    sd = {
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            torch.randn(2, dim // 2),
        "prompt_encoder.not_a_point_embed.weight": torch.randn(1, dim),
        "prompt_encoder.no_mask_embed.weight": torch.randn(1, dim),
    }
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = (
            torch.randn(1, dim))
    c = mask_in_chans
    sd["prompt_encoder.mask_downscaling.0.weight"] = torch.randn(
        c // 4, 1, 2, 2)
    sd["prompt_encoder.mask_downscaling.0.bias"] = torch.randn(c // 4)
    sd["prompt_encoder.mask_downscaling.1.weight"] = torch.randn(c // 4)
    sd["prompt_encoder.mask_downscaling.1.bias"] = torch.randn(c // 4)
    sd["prompt_encoder.mask_downscaling.3.weight"] = torch.randn(
        c, c // 4, 2, 2)
    sd["prompt_encoder.mask_downscaling.3.bias"] = torch.randn(c)
    sd["prompt_encoder.mask_downscaling.4.weight"] = torch.randn(c)
    sd["prompt_encoder.mask_downscaling.4.bias"] = torch.randn(c)
    sd["prompt_encoder.mask_downscaling.6.weight"] = torch.randn(
        dim, c, 1, 1)
    sd["prompt_encoder.mask_downscaling.6.bias"] = torch.randn(dim)
    return sd


class TestSamPromptConversion:
    def test_point_encoding_parity(self, rng):
        from tools.convert_weights import convert_sam_prompt
        from sam6d_tpu.models.ism.sam.prompt import PromptEncoder

        torch.manual_seed(1)
        dim = 256
        sd = _prompt_sd(dim)
        params = convert_sam_prompt(sd)

        penc = PromptEncoder(embed_dim=dim, image_embedding_size=(8, 8),
                             input_image_size=(64, 64))
        pts = jnp.asarray(rng.rand(2, 3, 2).astype(np.float32) * 64)
        labels = jnp.ones((2, 3), jnp.int32)
        emb = penc.apply({"params": params}, pts, labels,
                         method=PromptEncoder.encode_points)

        # Torch oracle (reference prompt_encoder.py:_embed_points).
        g = sd["prompt_encoder.pe_layer"
               ".positional_encoding_gaussian_matrix"].numpy()
        p = np.concatenate(
            [np.asarray(pts) + 0.5, np.zeros((2, 1, 2), np.float32)], axis=1)
        coords = p / np.array([64.0, 64.0], np.float32)
        x = (2 * coords - 1) @ g * (2 * np.pi)
        pe = np.concatenate([np.sin(x), np.cos(x)], axis=-1)
        expect = pe.copy()
        expect[:, :3] += sd["prompt_encoder.point_embeddings.1.weight"].numpy()
        expect[:, 3] = sd["prompt_encoder.not_a_point_embed.weight"].numpy()
        np.testing.assert_allclose(np.asarray(emb), expect, atol=1e-4)

    def test_box_encoding_parity(self, rng):
        """Box corners vs the reference _embed_boxes oracle
        (prompt_encoder.py: corner PE + point_embeddings[2]/[3])."""
        from tools.convert_weights import convert_sam_prompt
        from sam6d_tpu.models.ism.sam.prompt import PromptEncoder

        torch.manual_seed(2)
        dim = 256
        sd = _prompt_sd(dim)
        params = convert_sam_prompt(sd)
        penc = PromptEncoder(embed_dim=dim, image_embedding_size=(8, 8),
                             input_image_size=(64, 64))
        boxes = jnp.asarray(rng.rand(3, 4).astype(np.float32) * 64)
        emb = penc.apply({"params": params}, boxes,
                         method=PromptEncoder.encode_boxes)

        g = sd["prompt_encoder.pe_layer"
               ".positional_encoding_gaussian_matrix"].numpy()
        coords = (np.asarray(boxes).reshape(3, 2, 2) + 0.5) / 64.0
        x = (2 * coords - 1) @ g * (2 * np.pi)
        pe = np.concatenate([np.sin(x), np.cos(x)], axis=-1)
        expect = pe.copy()
        expect[:, 0] += sd["prompt_encoder.point_embeddings.2.weight"].numpy()[0]
        expect[:, 1] += sd["prompt_encoder.point_embeddings.3.weight"].numpy()[0]
        np.testing.assert_allclose(np.asarray(emb), expect, atol=1e-4)

    def test_mask_downscaling_parity(self, rng):
        """encode_masks vs a torch oracle of the reference
        mask_downscaling Sequential (Conv2x2/s2, LayerNorm2d, GELU) x2
        + 1x1 conv."""
        from tools.convert_weights import convert_sam_prompt
        from sam6d_tpu.models.ism.sam.prompt import PromptEncoder

        torch.manual_seed(3)
        dim, c = 256, 16
        sd = _prompt_sd(dim, c)
        params = convert_sam_prompt(sd)
        penc = PromptEncoder(embed_dim=dim, image_embedding_size=(8, 8),
                             input_image_size=(64, 64), mask_in_chans=c)
        m = rng.randn(2, 32, 32, 1).astype(np.float32)
        out = penc.apply({"params": params}, jnp.asarray(m),
                         method=PromptEncoder.encode_masks)

        conv0 = tnn.Conv2d(1, c // 4, 2, 2)
        ln1 = TorchLayerNorm2d(c // 4)
        conv3 = tnn.Conv2d(c // 4, c, 2, 2)
        ln4 = TorchLayerNorm2d(c)
        conv6 = tnn.Conv2d(c, dim, 1)
        with torch.no_grad():
            conv0.weight.copy_(sd["prompt_encoder.mask_downscaling.0.weight"])
            conv0.bias.copy_(sd["prompt_encoder.mask_downscaling.0.bias"])
            ln1.weight.copy_(sd["prompt_encoder.mask_downscaling.1.weight"])
            ln1.bias.copy_(sd["prompt_encoder.mask_downscaling.1.bias"])
            conv3.weight.copy_(sd["prompt_encoder.mask_downscaling.3.weight"])
            conv3.bias.copy_(sd["prompt_encoder.mask_downscaling.3.bias"])
            ln4.weight.copy_(sd["prompt_encoder.mask_downscaling.4.weight"])
            ln4.bias.copy_(sd["prompt_encoder.mask_downscaling.4.bias"])
            conv6.weight.copy_(sd["prompt_encoder.mask_downscaling.6.weight"])
            conv6.bias.copy_(sd["prompt_encoder.mask_downscaling.6.bias"])
            t = torch.from_numpy(m.transpose(0, 3, 1, 2))
            t = torch.nn.functional.gelu(ln1(conv0(t)))
            t = torch.nn.functional.gelu(ln4(conv3(t)))
            expect = conv6(t).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out), expect, atol=2e-4, rtol=1e-3
        )


class TorchLayerNorm2d(tnn.Module):
    """SAM-style LayerNorm2d: normalize over the channel dim of NCHW."""

    def __init__(self, c):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(c))
        self.bias = tnn.Parameter(torch.zeros(c))

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TorchViTAEDeconv(tnn.Module):
    """Reference ViT_AE with up_type='deconv'
    (feature_extraction.py:66-74, :109-116) at tiny dims."""

    def __init__(self, dim=32, out=16, depth=12, img=32, patch=8):
        super().__init__()
        self.vit = TorchViT(patch=patch, dim=dim, depth=depth, heads=4,
                            img=img)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(dim * 4, out * 2, kernel_size=2, stride=2),
            TorchLayerNorm2d(out * 2),
            tnn.GELU(),
            tnn.ConvTranspose2d(out * 2, out, kernel_size=2, stride=2),
        )
        self.hp = img // patch

    def forward(self, x):
        B, _, H, W = x.shape
        taps = self.vit(x)
        cls = taps[-1][:, 0]
        feats = torch.cat([t[:, 1:] for t in taps], dim=2)
        y = feats.transpose(1, 2).reshape(B, -1, self.hp, self.hp)
        y = self.output_upscaling(y)
        y = torch.nn.functional.interpolate(
            y, (H, W), mode="bilinear", align_corners=False
        )
        return y, cls


class TestDeconvUpscalingConversion:
    def test_forward_parity(self, rng):
        """ViTAE's block-channel deconv formulation + the ConvTranspose-
        as-Dense conversion must match the reference Sequential
        (ConvT -> LayerNorm2d -> GELU -> ConvT) bit-for-bit (fp32 tol)."""
        import sys

        sys.path.insert(0, "tools")
        from convert_weights import _deconv_upscaling, convert_vit_backbone

        from sam6d_tpu.config import ViTConfig
        from sam6d_tpu.models.pem.feature_extraction import ViTAE

        tmodel = TorchViTAEDeconv().eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        vit_params = convert_vit_backbone(
            {k[len("vit."):]: v for k, v in sd.items()
             if k.startswith("vit.")},
            "", 12,
        )
        params = {
            "vit": vit_params,
            **_deconv_upscaling(sd, "output_upscaling"),
        }

        cfg = ViTConfig(embed_dim=32, out_dim=16, img_size=32,
                        patch_size=8, num_heads=4, up_type="deconv")
        jmodel = ViTAE(cfg)

        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            want_map, want_cls = tmodel(
                torch.tensor(x.transpose(0, 3, 1, 2))
            )
        got_map, got_cls = jmodel.apply(
            {"params": params}, jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(got_cls), want_cls.numpy(), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_map).transpose(0, 3, 1, 2), want_map.numpy(),
            atol=3e-5,
        )

    def test_lowres_map_matches_pre_interpolation(self, rng):
        """lowres=True must return the raw 4x-per-patch grid the folded
        bilinear gather consumes (get_img_feats works for both
        up_types)."""
        from sam6d_tpu.config import ViTConfig
        from sam6d_tpu.models.pem.feature_extraction import ViTAE

        cfg = ViTConfig(embed_dim=32, out_dim=16, img_size=32,
                        patch_size=8, num_heads=4, up_type="deconv")
        jmodel = ViTAE(cfg)
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        variables = jmodel.init(jax.random.PRNGKey(0), x)
        low, _ = jmodel.apply(variables, x, lowres=True)
        assert low.shape == (1, 16, 16, 16)  # (hp*4, hp*4, out_dim)
