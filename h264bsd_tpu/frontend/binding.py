"""ctypes binding for the host front-end library."""

from __future__ import annotations

import ctypes as ct

import numpy as np

from .build import build

_lib = None


def lib() -> ct.CDLL:
    global _lib
    if _lib is None:
        _lib = ct.CDLL(str(build()))
        _configure(_lib)
    return _lib


def _configure(L: ct.CDLL) -> None:
    L.h264tpu_dev_coeff_token.restype = ct.c_uint32
    L.h264tpu_dev_coeff_token.argtypes = [ct.c_uint32, ct.c_int32]
    L.h264tpu_dev_total_zeros.restype = ct.c_uint32
    L.h264tpu_dev_total_zeros.argtypes = [ct.c_uint32, ct.c_uint32, ct.c_int32]
    L.h264tpu_dev_run_before.restype = ct.c_uint32
    L.h264tpu_dev_run_before.argtypes = [ct.c_uint32, ct.c_uint32]
    L.h264tpu_dev_residual_block.restype = ct.c_uint32
    L.h264tpu_dev_residual_block.argtypes = [
        ct.c_char_p, ct.c_uint32, ct.c_int32, ct.c_uint32,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
    ]
    L.h264tpu_dev_parse_sps.restype = ct.c_uint32
    L.h264tpu_dev_parse_sps.argtypes = [
        ct.c_char_p, ct.c_uint32,
        np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
    ]


def dev_parse_sps(data: bytes) -> dict:
    out = np.zeros(13, np.uint32)
    status = lib().h264tpu_dev_parse_sps(data, len(data), out)
    if status != 0:
        raise ValueError(f"SPS parse failed with status {status}")
    keys = ["width_mbs", "height_mbs", "crop_l", "crop_r", "crop_t", "crop_b",
            "max_dpb", "num_ref", "max_frame_num", "poc_type", "level",
            "profile", "cropping"]
    return dict(zip(keys, out.tolist()))
