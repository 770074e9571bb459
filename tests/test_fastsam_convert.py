"""FastSAM weight conversion parity: a torch YOLOv8-seg oracle with
ultralytics state-dict key layout (model.N.*) is built from the
architecture spec, randomly initialized, converted via
tools.convert_weights.convert_fastsam, and the flax forward must match
the torch forward (raw head outputs + prototypes).

This is the analog of the reference's ov_op_test torch-vs-OV parity
pattern (SURVEY.md §4), with torch as the oracle.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sam6d_tpu.models.ism.fastsam import YOLOv8Seg, make_divisible  # noqa: E402

import sys, pathlib  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
from convert_weights import convert_fastsam  # noqa: E402


# ---- torch oracle (ultralytics module/key layout, written from spec) ----

class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c1, c2, 3)
        self.cv2 = TConv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TBottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y = [x, self.m(x)]
        y.extend(self.m(y[-1]) for _ in range(2))
        return self.cv2(torch.cat(y, 1))


class TProto(tnn.Module):
    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = tnn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegmentHead(tnn.Module):
    """ultralytics Segment head: cv2=box, cv3=cls, cv4=mask-coef, proto."""

    def __init__(self, ch, nc=1, nm=32, npr=256, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * reg_max)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for x in ch)
        self.cv4 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c4, 3), TConv(c4, c4, 3),
                           tnn.Conv2d(c4, nm, 1)) for x in ch)
        self.proto = TProto(ch[0], npr, nm)


class TYOLOv8Seg(tnn.Module):
    def __init__(self, width=0.25, depth=0.33, max_channels=1024):
        super().__init__()
        w = lambda c: make_divisible(min(c, max_channels) * width)
        d = lambda n: max(1, int(round(n * depth)))
        ch = [w(256), w(512), w(1024)]
        layers = [
            TConv(3, w(64), 3, 2),            # 0
            TConv(w(64), w(128), 3, 2),       # 1
            TC2f(w(128), w(128), d(3), True), # 2
            TConv(w(128), w(256), 3, 2),      # 3
            TC2f(w(256), w(256), d(6), True), # 4
            TConv(w(256), w(512), 3, 2),      # 5
            TC2f(w(512), w(512), d(6), True), # 6
            TConv(w(512), w(1024), 3, 2),     # 7
            TC2f(w(1024), w(1024), d(3), True),  # 8
            TSPPF(w(1024), w(1024)),          # 9
            tnn.Identity(),                   # 10 upsample
            tnn.Identity(),                   # 11 concat
            TC2f(w(1024) + w(512), w(512), d(3)),  # 12
            tnn.Identity(),                   # 13 upsample
            tnn.Identity(),                   # 14 concat
            TC2f(w(512) + w(256), w(256), d(3)),   # 15
            TConv(w(256), w(256), 3, 2),      # 16
            tnn.Identity(),                   # 17 concat
            TC2f(w(256) + w(512), w(512), d(3)),   # 18
            TConv(w(512), w(512), 3, 2),      # 19
            tnn.Identity(),                   # 20 concat
            TC2f(w(512) + w(1024), w(1024), d(3)), # 21
            TSegmentHead(ch, npr=w(256)),     # 22
        ]
        self.model = tnn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        up = lambda t: tnn.functional.interpolate(t, scale_factor=2,
                                                  mode="nearest")
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([up(p5), p4], 1))
        n3 = m[15](torch.cat([up(n4), p3], 1))
        n4b = m[18](torch.cat([m[16](n3), n4], 1))
        n5 = m[21](torch.cat([m[19](n4b), p5], 1))
        head = m[22]
        outs = []
        for i, feat in enumerate((n3, n4b, n5)):
            outs.append((head.cv2[i](feat), head.cv3[i](feat),
                         head.cv4[i](feat)))
        return outs, head.proto(n3)


def _randomize(model, gen):
    """Random weights AND random (non-trivial) BN running stats."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        for mod in model.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)


def test_fastsam_conversion_forward_parity():
    gen = torch.Generator().manual_seed(0)
    tmodel = TYOLOv8Seg(width=0.25, depth=0.33).eval()
    _randomize(tmodel, gen)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}

    variables = jax.tree.map(jnp.asarray, convert_fastsam(sd))
    fmodel = YOLOv8Seg(width=0.25, depth=0.33)

    x = torch.randn(1, 3, 128, 128, generator=gen)
    with torch.no_grad():
        t_outs, t_proto = tmodel(x)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    f_outs, f_proto = fmodel.apply(variables, xj)

    # Converted variable tree must exactly cover what init would create.
    init_vars = fmodel.init(jax.random.PRNGKey(0), xj)
    for col in ("params", "batch_stats"):
        got = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_leaves_with_path(variables[col])}
        want = {jax.tree_util.keystr(k)
                for k, _ in jax.tree_util.tree_leaves_with_path(init_vars[col])}
        assert got == want, (col, got ^ want)

    np.testing.assert_allclose(
        np.asarray(f_proto), t_proto.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3)
    for (tb, tc, tm), (fb, fc, fm) in zip(t_outs, f_outs):
        for t, f in ((tb, fb), (tc, fc), (tm, fm)):
            np.testing.assert_allclose(
                np.asarray(f), t.numpy().transpose(0, 2, 3, 1),
                atol=2e-4, rtol=1e-3)
