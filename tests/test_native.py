"""Native C++ host-runtime library: build, parity vs the numpy
reference implementations, and dispatch wiring.

Mirrors the reference's per-op parity harness (ov_op_test/: torch
oracle vs native op at realistic shapes) with numpy as the oracle.
"""

import numpy as np
import pytest

from sam6d_tpu.utils import native
from sam6d_tpu.utils.rle import mask_to_rle, rle_to_mask


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def _sphere_mesh(n=24):
    """A UV-sphere with vertex attrs for rasterizer tests."""
    th = np.linspace(0.2, np.pi - 0.2, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            c = a + 2 * n
            d = b + 2 * n
            faces += [[a, b, c], [b, d, c]]
    return verts, np.asarray(faces, np.int32)


class TestRasterizer:
    def test_parity_vs_numpy(self, lib):
        from sam6d_tpu.pipeline.renderer import rasterize_numpy

        verts, faces = _sphere_mesh()
        verts_cam = verts + np.array([0, 0, 3.0], np.float32)
        K = np.array([[120, 0, 64], [0, 120, 64], [0, 0, 1]], np.float32)
        attrs = np.concatenate(
            [verts, np.ones((len(verts), 1), np.float32)], axis=1)

        ref_img, ref_mask, ref_depth = rasterize_numpy(
            verts_cam, faces, K, (128, 128), attrs)
        out = native.rasterize(verts_cam, faces, K, (128, 128), attrs)
        assert out is not None
        img, mask, depth = out

        # Identical coverage up to boundary-pixel FP ties.
        disagree = (mask != ref_mask).mean()
        assert disagree < 2e-3, disagree
        both = mask & ref_mask
        np.testing.assert_allclose(depth[both], ref_depth[both],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(img[both], ref_img[both],
                                   rtol=1e-3, atol=1e-3)
        assert both.sum() > 1000  # the sphere is actually visible

    def test_dispatch_used_by_renderer(self, lib):
        from sam6d_tpu.pipeline.renderer import rasterize

        verts, faces = _sphere_mesh(8)
        out = rasterize(
            verts + np.array([0, 0, 3.0], np.float32), faces,
            np.array([[60, 0, 32], [0, 60, 32], [0, 0, 1]], np.float32),
            (64, 64), verts,
        )
        assert out[1].any()


class TestRLE:
    def test_roundtrip_parity(self, lib, rng):
        mask = rng.rand(97, 123) > 0.7
        rle = mask_to_rle(mask)
        # Counts identical to the numpy formulation.
        flat = mask.flatten(order="F")
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        counts = np.diff(np.r_[0, change, flat.size]).tolist()
        if flat[0]:
            counts = [0] + counts
        assert rle["counts"] == counts
        np.testing.assert_array_equal(rle_to_mask(rle), mask)

    def test_empty_and_full(self, lib):
        for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
            rle = mask_to_rle(mask)
            np.testing.assert_array_equal(rle_to_mask(rle), mask)

    def test_numpy_fallback_matches(self, lib, rng, monkeypatch):
        mask = rng.rand(50, 60) > 0.5
        with_native = mask_to_rle(mask)
        monkeypatch.setenv("SAM6D_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", False)
        without = mask_to_rle(mask)
        assert with_native == without
        np.testing.assert_array_equal(
            rle_to_mask(with_native), rle_to_mask(without))
