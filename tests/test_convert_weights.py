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
