"""Shared builder for the compiled reference ROIAlign oracle.

Compiles the reference's vendored detectron2 ``ROIAlign_cpu.cpp`` VERBATIM
against the minimal stub ATen headers in tests/roialign_ref/ and exposes it
through ctypes. Used by tests/test_roi_align.py (kernel parity) and
tests/test_pipeline_parity.py (the torch-golden detection head's ROIAlign).
"""

import ctypes
import os
import subprocess

import numpy as np

REFERENCE_CPP = (
    "/root/reference/config_slowfast/detectron2/detectron2/layers/csrc/"
    "ROIAlign/ROIAlign_cpu.cpp"
)


def reference_available() -> bool:
    return os.path.exists(REFERENCE_CPP)


def build_reference_roialign(build_dir):
    """Compile the oracle into ``build_dir``; returns
    ``run(feat_bhwc, rois, out_size, scale, sampling_ratio, aligned)``
    producing (R, out, out, C) float32."""
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(str(build_dir), exist_ok=True)
    so = os.path.join(str(build_dir), "libroialign_ref.so")
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-std=c++17", "-shared",
         "-I", os.path.join(here, "roialign_ref", "include"),
         REFERENCE_CPP, os.path.join(here, "roialign_ref", "shim.cpp"),
         "-o", so],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.ref_roialign_forward.restype = ctypes.c_int

    def run(feat_bhwc, rois, out_size, scale, sampling_ratio, aligned):
        feat_nchw = np.ascontiguousarray(
            np.asarray(feat_bhwc).transpose(0, 3, 1, 2), np.float32)
        rois = np.ascontiguousarray(rois, np.float32)
        n, c, h, w = feat_nchw.shape
        r = len(rois)
        o = np.empty((r, c, out_size, out_size), np.float32)
        rc = lib.ref_roialign_forward(
            feat_nchw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, c, h, w,
            rois.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), r,
            ctypes.c_float(scale), out_size, out_size,
            int(sampling_ratio), int(bool(aligned)),
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert rc == 0
        return o.transpose(0, 2, 3, 1)

    return run
