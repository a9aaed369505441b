"""ctypes bindings for the system giflib, used ONLY as a test oracle.

The engine's GIF codec (operators/gif.py) is native Python/numpy; this
module lets the test suite validate it index-exactly against the
canonical giflib (DGifSlurp) when libgif.so.7 is present — tests skip
otherwise.  DGifSlurp returns DEINTERLACED index rasters per image
descriptor plus the color tables and (via DGifSavedExtensionToGCB) the
per-image graphic-control state, so the comparison covers the LZW
decoder, interlace reordering, palettes and GCE parsing while leaving
canvas composition (our logic, spec-derived) to dedicated unit tests.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

_LIB = None


class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.c_void_p)]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_ColorMapObject))]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_uint8)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_uint8),
                ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


class _GCB(ctypes.Structure):
    _fields_ = [("DisposalMode", ctypes.c_int),
                ("UserInputFlag", ctypes.c_bool),
                ("DelayTime", ctypes.c_int),
                ("TransparentColor", ctypes.c_int)]


def libgif():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL("libgif.so.7")
        lib.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
        lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_int)]
        lib.DGifSlurp.restype = ctypes.c_int
        lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
        lib.DGifCloseFile.restype = ctypes.c_int
        lib.DGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.DGifSavedExtensionToGCB.restype = ctypes.c_int
        lib.DGifSavedExtensionToGCB.argtypes = [
            ctypes.POINTER(_GifFileType), ctypes.c_int,
            ctypes.POINTER(_GCB)]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        libgif()
        return True
    except OSError:
        return False


def _palette(cm) -> np.ndarray | None:
    if not cm:
        return None
    n = cm.contents.ColorCount
    buf = ctypes.string_at(cm.contents.Colors, 3 * n)
    return np.frombuffer(buf, np.uint8).reshape(n, 3).copy()


def slurp(data: bytes) -> dict:
    """Decode via DGifSlurp -> {width, height, images: [{left, top,
    width, height, interlace, palette, indices (DEINTERLACED),
    disposal, delay_cs, transparent}]}.  Raises ValueError on any
    giflib error."""
    lib = libgif()
    err = ctypes.c_int(0)
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        gf = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not gf:
            raise ValueError(f"giflib open error {err.value}")
        try:
            if lib.DGifSlurp(gf) != 1:
                raise ValueError(f"giflib slurp error {gf.contents.Error}")
            g = gf.contents
            out = {"width": g.SWidth, "height": g.SHeight,
                   "background": g.SBackGroundColor,
                   "global_palette": _palette(g.SColorMap), "images": []}
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                npx = d.Width * d.Height
                idx = np.frombuffer(
                    ctypes.string_at(si.RasterBits, npx),
                    np.uint8).reshape(d.Height, d.Width).copy()
                gcb = _GCB()
                has_gcb = lib.DGifSavedExtensionToGCB(
                    gf, i, ctypes.byref(gcb)) == 1
                out["images"].append({
                    "left": d.Left, "top": d.Top, "width": d.Width,
                    "height": d.Height, "interlace": bool(d.Interlace),
                    "palette": _palette(d.ColorMap),
                    "indices": idx,
                    "disposal": gcb.DisposalMode if has_gcb else 0,
                    "delay_cs": gcb.DelayTime if has_gcb else 0,
                    "transparent": (gcb.TransparentColor
                                    if has_gcb
                                    and gcb.TransparentColor >= 0
                                    else None)})
            return out
        finally:
            lib.DGifCloseFile(gf, ctypes.byref(err))
    finally:
        os.unlink(path)
