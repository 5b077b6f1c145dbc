"""ctypes binding to a system libbrotli — the fast brotli path when
no Python ``brotli`` wheel is installed but shared libraries exist
(conda envs, distro packages ship ``libbrotlienc``/``libbrotlidec``).

Gives the codec layer REAL quality-1..11 brotli encode and decode —
i.e. files byte-compatible with the reference codec's JNI library
(``bro.cc:77-87`` drives the same C API: ``BrotliEncoderCompress`` /
``BrotliDecoderDecompressStream``) — with zero third-party Python
dependencies. The pure-Python decoder (``brotli_pure.py``) remains
the floor when no library exists at all.

Streaming both ways (bounded memory, push-style) to match the
reference's block pipeline semantics. Raw custom dictionaries attach
via the shared-dictionary API when this libbrotli exports it.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
from functools import lru_cache

# Directories likely to hold a coherent libbrotli triple. Checked in
# order; conda-style prefixes first because distro brotli (1.0.x)
# predates the shared-dictionary API. BROTLI_LIB_DIR overrides.
# Loading enc/dec WITH their sibling libbrotlicommon matters: mixing
# versions across roots fails symbol resolution (the common lib is
# process-global once loaded).
_LIB_ROOTS = [
    "/root/miniconda/lib",
    "/opt/conda/lib",
    "/usr/lib/x86_64-linux-gnu",
    "/usr/lib64",
    "/usr/lib",
    "/usr/local/lib",
]

# BrotliEncoderOperation
_OP_PROCESS = 0
_OP_FINISH = 2
# BrotliEncoderParameter
_PARAM_QUALITY = 1
_PARAM_LGWIN = 2
# BrotliDecoderResult
_DEC_ERROR = 0
_DEC_SUCCESS = 1
_DEC_NEEDS_MORE_INPUT = 2
_DEC_NEEDS_MORE_OUTPUT = 3
# BrotliSharedDictionaryType
_DICT_RAW = 0

_CHUNK = 1 << 18


def _load_pair() -> tuple[ctypes.CDLL, ctypes.CDLL] | None:
    """Load a coherent (libbrotlienc, libbrotlidec) pair from one
    root, preloading the sibling libbrotlicommon RTLD_GLOBAL so the
    enc/dec libs bind against THEIR version. Falls back to the
    dynamic-linker default names if no root matches."""
    roots = list(_LIB_ROOTS)
    env = os.environ.get("BROTLI_LIB_DIR")
    if env:
        roots.insert(0, env)
    for root in roots:
        epath = os.path.join(root, "libbrotlienc.so.1")
        dpath = os.path.join(root, "libbrotlidec.so.1")
        if not (os.path.exists(epath) and os.path.exists(dpath)):
            continue
        try:
            cpath = os.path.join(root, "libbrotlicommon.so.1")
            if os.path.exists(cpath):
                ctypes.CDLL(cpath, mode=ctypes.RTLD_GLOBAL)
            return ctypes.CDLL(epath), ctypes.CDLL(dpath)
        except OSError:
            continue
    try:
        found_e = ctypes.util.find_library("brotlienc")
        found_d = ctypes.util.find_library("brotlidec")
        if found_e and found_d:
            return ctypes.CDLL(found_e), ctypes.CDLL(found_d)
    except OSError:  # pragma: no cover
        pass
    return None


@lru_cache(maxsize=1)
def _libs() -> tuple[ctypes.CDLL, ctypes.CDLL] | None:
    pair = _load_pair()
    if pair is None:
        return None
    enc, dec = pair
    enc.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
    enc.BrotliEncoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    enc.BrotliEncoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32,
    ]
    enc.BrotliEncoderCompressStream.restype = ctypes.c_int
    enc.BrotliEncoderCompressStream.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    enc.BrotliEncoderIsFinished.restype = ctypes.c_int
    enc.BrotliEncoderIsFinished.argtypes = [ctypes.c_void_p]
    enc.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]
    dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    dec.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
    dec.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    dec.BrotliDecoderIsFinished.restype = ctypes.c_int
    dec.BrotliDecoderIsFinished.argtypes = [ctypes.c_void_p]
    dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    return enc, dec


def available() -> bool:
    """True when a loadable libbrotlienc + libbrotlidec pair exists."""
    return _libs() is not None


def _enc_supports_dictionary(enc: ctypes.CDLL) -> bool:
    return hasattr(enc, "BrotliEncoderPrepareDictionary") and hasattr(
        enc, "BrotliEncoderAttachPreparedDictionary"
    )


class CtypesBrotliCompressor:
    """Streaming brotli encoder over libbrotlienc (push-style:
    ``compress`` may be called repeatedly; ``finish`` closes the
    stream)."""

    def __init__(self, quality: int, lgwin: int = 22,
                 dictionary: bytes | None = None) -> None:
        libs = _libs()
        if libs is None:  # pragma: no cover - env without libbrotli
            raise RuntimeError("no system libbrotli available")
        self._enc, _ = libs
        self._state = self._enc.BrotliEncoderCreateInstance(None, None, None)
        if not self._state:  # pragma: no cover
            raise MemoryError("BrotliEncoderCreateInstance failed")
        self._enc.BrotliEncoderSetParameter(
            self._state, _PARAM_QUALITY, max(0, min(11, quality))
        )
        self._enc.BrotliEncoderSetParameter(self._state, _PARAM_LGWIN, lgwin)
        self._prepared = None
        if dictionary:
            if not _enc_supports_dictionary(self._enc):  # pragma: no cover
                raise NotImplementedError(
                    "this libbrotli has no shared-dictionary API"
                )
            self._enc.BrotliEncoderPrepareDictionary.restype = ctypes.c_void_p
            self._prepared = self._enc.BrotliEncoderPrepareDictionary(
                _DICT_RAW, len(dictionary),
                ctypes.c_char_p(bytes(dictionary)), max(0, min(11, quality)),
                None, None, None,
            )
            if not self._prepared or not (
                self._enc.BrotliEncoderAttachPreparedDictionary(
                    ctypes.c_void_p(self._state),
                    ctypes.c_void_p(self._prepared),
                )
            ):  # pragma: no cover
                raise RuntimeError("brotli dictionary attach failed")

    def _drive(self, data: bytes, op: int) -> bytes:
        out = bytearray()
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.c_char_p(data)
        while True:
            buf = ctypes.create_string_buffer(_CHUNK)
            avail_out = ctypes.c_size_t(_CHUNK)
            next_out = ctypes.cast(buf, ctypes.c_char_p)
            ok = self._enc.BrotliEncoderCompressStream(
                self._state, op,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None,
            )
            if not ok:  # pragma: no cover
                raise RuntimeError("BrotliEncoderCompressStream failed")
            produced = _CHUNK - avail_out.value
            out += buf.raw[:produced]
            if avail_in.value == 0 and (
                op == _OP_PROCESS
                or self._enc.BrotliEncoderIsFinished(self._state)
            ):
                if produced < _CHUNK:
                    return bytes(out)
            if produced == 0 and avail_in.value == 0:
                return bytes(out)

    def compress(self, data: bytes) -> bytes:
        return self._drive(bytes(data), _OP_PROCESS)

    def finish(self) -> bytes:
        out = self._drive(b"", _OP_FINISH)
        self._enc.BrotliEncoderDestroyInstance(self._state)
        self._state = None
        return out


class CtypesBrotliError(IOError):
    """Stream rejected by libbrotlidec."""


class CtypesBrotliDecompressor:
    """Streaming brotli decoder over libbrotlidec."""

    def __init__(self, dictionary: bytes | None = None) -> None:
        libs = _libs()
        if libs is None:  # pragma: no cover
            raise RuntimeError("no system libbrotli available")
        _, self._dec = libs
        self._state = self._dec.BrotliDecoderCreateInstance(None, None, None)
        if not self._state:  # pragma: no cover
            raise MemoryError("BrotliDecoderCreateInstance failed")
        self._dictionary = bytes(dictionary) if dictionary else None
        if self._dictionary:
            if not hasattr(self._dec, "BrotliDecoderAttachDictionary"):
                raise NotImplementedError(  # pragma: no cover
                    "this libbrotli has no shared-dictionary API"
                )
            ok = self._dec.BrotliDecoderAttachDictionary(
                ctypes.c_void_p(self._state), _DICT_RAW,
                len(self._dictionary), ctypes.c_char_p(self._dictionary),
            )
            if not ok:  # pragma: no cover
                raise RuntimeError("brotli dictionary attach failed")
        self._finished = False

    def decompress(self, data: bytes) -> bytes:
        data = bytes(data)
        out = bytearray()
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.c_char_p(data)
        while True:
            buf = ctypes.create_string_buffer(_CHUNK)
            avail_out = ctypes.c_size_t(_CHUNK)
            next_out = ctypes.cast(buf, ctypes.c_char_p)
            res = self._dec.BrotliDecoderDecompressStream(
                self._state,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None,
            )
            out += buf.raw[: _CHUNK - avail_out.value]
            if res == _DEC_ERROR:
                raise CtypesBrotliError("corrupt brotli stream")
            if res == _DEC_SUCCESS:
                self._finished = True
                if avail_in.value:
                    raise CtypesBrotliError(
                        "trailing bytes after brotli stream"
                    )
                return bytes(out)
            if res == _DEC_NEEDS_MORE_INPUT:
                return bytes(out)
            # NEEDS_MORE_OUTPUT: loop with a fresh buffer

    def finish(self) -> bytes:
        if not self._finished:
            raise CtypesBrotliError("truncated brotli stream")
        self._dec.BrotliDecoderDestroyInstance(self._state)
        self._state = None
        return b""

    @property
    def eof(self) -> bool:
        return self._finished
