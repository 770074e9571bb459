"""ctypes bindings for the native host-runtime library (native/).

The TPU build keeps all device compute in XLA/Pallas; host-side hot
loops (template rasterization, RLE mask serialization) live in C++
(native/src/), the analog of the reference's native layer
(pointnet2/_ext_src CUDA ext, ov_pointnet2_op C++/OpenCL).

The library is built on first use (cmake if available, plain g++
otherwise) into native/build/; set SAM6D_NO_NATIVE=1 to force the
numpy fallbacks, SAM6D_NATIVE_LIB to point at a prebuilt .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libsam6d_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> str | None:
    srcs = [
        os.path.join(_NATIVE_DIR, "src", f)
        for f in sorted(os.listdir(os.path.join(_NATIVE_DIR, "src")))
        if f.endswith(".cpp")
    ]
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           *srcs, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def load_library() -> ctypes.CDLL | None:
    """The native library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SAM6D_NO_NATIVE"):
            return None
        path = os.environ.get("SAM6D_NATIVE_LIB") or _LIB_PATH
        if not os.path.exists(path):
            built = _build()
            if built is None:
                return None
            path = built
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        c_int = ctypes.c_int

        lib.sam6d_rasterize.argtypes = [
            f32p, c_int, i32p, c_int, f32p, c_int, c_int, f32p, c_int,
            f32p, f32p, u8p,
        ]
        lib.sam6d_rasterize.restype = None
        lib.sam6d_rle_encode.argtypes = [u8p, c_int, c_int, u32p]
        lib.sam6d_rle_encode.restype = c_int
        lib.sam6d_rle_decode.argtypes = [u32p, c_int, c_int, c_int, u8p]
        lib.sam6d_rle_decode.restype = None
        _lib = lib
        return _lib


def rasterize(
    verts_cam: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    hw: tuple[int, int],
    vert_attrs: np.ndarray,
):
    """Native z-buffer rasterization; same contract as
    pipeline.renderer.rasterize_numpy. Returns None if the native
    library is unavailable (caller falls back)."""
    lib = load_library()
    if lib is None:
        return None
    H, W = hw
    verts = np.ascontiguousarray(verts_cam, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    k = np.ascontiguousarray(K, np.float32)
    attrs = np.ascontiguousarray(vert_attrs, np.float32)
    A = attrs.shape[1]
    attr_img = np.empty((H, W, A), np.float32)
    depth = np.empty((H, W), np.float32)
    mask = np.empty((H, W), np.uint8)
    lib.sam6d_rasterize(
        verts, len(verts), f, len(f), k, H, W, attrs, A,
        attr_img, depth, mask,
    )
    return attr_img, mask.astype(bool), depth


def rle_encode(mask: np.ndarray) -> list[int] | None:
    lib = load_library()
    if lib is None:
        return None
    m = np.ascontiguousarray(np.asarray(mask, bool), np.uint8)
    H, W = m.shape
    counts = np.empty(H * W + 1, np.uint32)
    n = lib.sam6d_rle_encode(m, H, W, counts)
    return counts[:n].tolist()


def rle_decode(counts, h: int, w: int) -> np.ndarray | None:
    lib = load_library()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.uint32)
    mask = np.zeros((h, w), np.uint8)
    lib.sam6d_rle_decode(c, len(c), h, w, mask)
    return mask.astype(bool)
