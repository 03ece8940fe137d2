#!/usr/bin/env python3
"""Reference WebP encode/decode via the system's BSD-licensed libwebp,
driven over ctypes — the external conformance oracle for graft's
from-scratch VP8/VP8L codecs (the role ImageIO plays for JPEG).

Subcommands (all file-based, fixed little-endian headers):
  encode  <rgb_in> <w> <h> <quality> <webp_out>   lossy VP8 encode
  encode_lossless <rgb_in> <w> <h> <webp_out>     lossless VP8L encode
  decode_yuv <webp_in> <yuv_out>                  normative Y/U/V planes
  decode_rgb <webp_in> <rgb_out>                  libwebp's RGB view

decode_yuv output layout: 6 x int32 LE (w, h, uvw, uvh, ok, pad) then
Y (w*h bytes) then U (uvw*uvh) then V (uvw*uvh), strides removed.
Exit code 3 means libwebp rejected the payload (decode returned NULL).
"""
import ctypes
import sys
import struct

lib = ctypes.CDLL("libwebp.so.7")

lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def encode(rgb_path, w, h, quality, out_path, lossless=False):
    rgb = open(rgb_path, "rb").read()
    assert len(rgb) == 3 * w * h, (len(rgb), w, h)
    out = ctypes.POINTER(ctypes.c_ubyte)()
    if lossless:
        n = lib.WebPEncodeLosslessRGB(rgb, w, h, 3 * w, ctypes.byref(out))
    else:
        n = lib.WebPEncodeRGB(rgb, w, h, 3 * w, quality, ctypes.byref(out))
    if n == 0:
        sys.exit(3)
    open(out_path, "wb").write(bytes(out[:n]))


def decode_yuv(webp_path, out_path):
    data = open(webp_path, "rb").read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        sys.exit(3)
    W, H = w.value, h.value
    uvw, uvh = (W + 1) // 2, (H + 1) // 2
    with open(out_path, "wb") as f:
        f.write(struct.pack("<6i", W, H, uvw, uvh, 1, 0))
        for r in range(H):
            f.write(bytes(y[r * stride.value:r * stride.value + W]))
        for plane in (u, v):
            for r in range(uvh):
                f.write(bytes(plane[r * uv_stride.value:
                                    r * uv_stride.value + uvw]))


def decode_rgb(webp_path, out_path):
    data = open(webp_path, "rb").read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        sys.exit(3)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<6i", w.value, h.value, 0, 0, 1, 0))
        f.write(bytes(p[:3 * w.value * h.value]))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "encode":
        encode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               float(sys.argv[5]), sys.argv[6])
    elif cmd == "encode_lossless":
        encode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), 0.0,
               sys.argv[5], lossless=True)
    elif cmd == "decode_yuv":
        decode_yuv(sys.argv[2], sys.argv[3])
    elif cmd == "decode_rgb":
        decode_rgb(sys.argv[2], sys.argv[3])
    else:
        sys.exit(2)
