"""Pure-Python RFC 7932 brotli ENCODER — compressed metablocks with
no wheel and no native library (the round-4 verdict's last encoder
asymmetry: wheel-less hosts previously wrote only stored-mode brotli,
ratio 1.0; reference clusters compress at quality 1-11 via
``BroCompressor.java:116-148`` → ``bro.cc:77-87``).

This is a from-scratch implementation of the *specification* (the
reference repo contains no encoder either — its JNI layer calls the
vendored C library).  It emits a deliberately small, always-valid
subset of the format:

- one stream header (WBITS=22), then a sequence of metablocks of at
  most ``_BLOCK`` input bytes each;
- COMPRESSED metablocks with the trivial header shape (single block
  type per category, NPOSTFIX=0, NDIRECT=0, one literal tree, one
  distance tree, context map omitted) and three canonical
  length-limited Huffman codes serialized in the simple (<=4 symbol)
  or complex (code-length-code with 16/17 repeat runs) form;
- quality 0: a single insert-only command per metablock (pure
  Huffman over literal bytes);
- quality >= 1: greedy hash-table LZ77 (4-byte anchors, forward
  extension, overlap allowed) emitting insert-and-copy commands with
  explicit distances — never the implicit-distance-0 cells, never
  static-dictionary references;
- a per-metablock size guard: if the compressed form would exceed
  the raw bytes, the metablock is emitted UNCOMPRESSED instead (and
  a final empty metablock terminates the stream), so the output is
  never materially larger than the input.

Every emitted stream decodes with :mod:`brotli_pure` (strict: padding
and trailing-byte checks) and with the real libbrotli when present —
``tests/test_brotli_encoder.py`` cross-checks both.

Spec-table provenance: insert/copy ranges, the command-cell layout,
the code-length-code fixed code, and the repeat-run accumulation
semantics mirror RFC 7932 sections 3-5 exactly as implemented by the
decoder in ``brotli_pure.py`` (``_INSERT_CODES`` / ``_COPY_CODES`` /
``_CMD_CELLS`` / ``_CLC_ORDER``); the 16/17 repeat runs use the
bijective base-4/base-8 numeration induced by the decoder's
``repeat = (repeat - 2) << extra + read(extra) + 3`` recurrence.
"""

from __future__ import annotations

from ._brotli_data import (
    DICT_OFFSETS_BY_LENGTH,
    DICT_SIZE_BITS_BY_LENGTH,
)
from .brotli_pure import (
    _CLC_ORDER,
    _COPY_CODES,
    _INSERT_CODES,
    _dict_data,
)

# Metablock input granularity.  1 MiB keeps encoder memory and
# Huffman-build cost bounded while giving the entropy coder enough
# context; MLEN supports up to 16 MiB.
_BLOCK = 1 << 20
# WBITS=22 window; distances never exceed the in-metablock position,
# so anything <= window-16 is safe.
_WBITS = 22
_MAX_DIST = (1 << _WBITS) - 16

# (insert-code base cell, copy-code base cell) -> command cell index,
# explicit-distance cells only (inverse of brotli_pure._CMD_CELLS
# entries 2..10).
_CELL_OF = {
    (0, 0): 2, (0, 1): 3, (1, 0): 4, (1, 1): 5,
    (0, 2): 6, (2, 0): 7, (1, 2): 8, (2, 1): 9, (2, 2): 10,
}

# Fixed code for the lengths of the code-length code (RFC 3.5):
# length value -> (LSB-first bit pattern, bit count).
_CLC_FIXED = {0: (0, 2), 1: (7, 4), 2: (3, 3), 3: (2, 2), 4: (1, 2),
              5: (15, 4)}


class _BitWriter:
    """LSB-first bit accumulator; completed bytes can be drained
    incrementally so metablocks stream out as they are encoded."""

    __slots__ = ("_acc", "_n", "_out")

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def write(self, val: int, nbits: int) -> None:
        self._acc |= val << self._n
        self._n += nbits
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def align(self) -> None:
        if self._n:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0

    def raw(self, data: bytes) -> None:
        assert self._n == 0, "raw bytes require byte alignment"
        self._out += data

    def take(self) -> bytes:
        out = bytes(self._out)
        del self._out[:]
        return out


def _limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths via package-merge.
    Returns a COMPLETE code (Kraft sum exactly 1) for >=2 symbols."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 1:
        return {syms[0]: 1}
    if n > (1 << limit):
        raise ValueError("alphabet too large for length limit")
    base = sorted((freqs[s], (s,)) for s in syms)
    merged = list(base)
    for _ in range(limit - 1):
        paired = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(base + paired)
    lengths = dict.fromkeys(syms, 0)
    for _, ss in merged[: 2 * n - 2]:
        for s in ss:
            lengths[s] += 1
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical code per symbol, bit-reversed for LSB-first writing —
    the exact inverse of ``brotli_pure._Prefix``.  A single-symbol
    code costs 0 bits."""
    used = {s: ln for s, ln in lengths.items() if ln}
    if len(used) == 1:
        return {next(iter(used)): (0, 0)}
    max_len = max(used.values())
    counts = [0] * (max_len + 1)
    for ln in used.values():
        counts[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in sorted(used):
        ln = used[sym]
        c = next_code[ln]
        next_code[ln] += 1
        rev = 0
        for _ in range(ln):
            rev = (rev << 1) | (c & 1)
            c >>= 1
        out[sym] = (rev, ln)
    return out


def _bij_digits(u: int, b: int) -> list[int]:
    """Bijective base-``b`` digits (each in 1..b), most significant
    first — the numeration induced by the decoder's repeat-run
    accumulation."""
    ds: list[int] = []
    while u > 0:
        d = u % b
        if d == 0:
            d = b
        ds.append(d)
        u = (u - d) // b
    ds.reverse()
    return ds


def _length_sequence(
    lengths: dict[int, int]
) -> list[tuple[int, int, int]]:
    """Code-length sequence with 16/17 repeat runs:
    [(clc_symbol, extra_value, extra_bits), ...] covering symbols 0
    through the last used one (the decoder stops once the code is
    complete, so trailing zeros are never emitted)."""
    last = max(s for s, ln in lengths.items() if ln)
    seq: list[tuple[int, int, int]] = []
    sym = 0
    while sym <= last:
        ln = lengths.get(sym, 0)
        run = 1
        while sym + run <= last and lengths.get(sym + run, 0) == ln:
            run += 1
        if ln == 0:
            if run < 3:
                seq.extend((0, 0, 0) for _ in range(run))
            else:
                for d in _bij_digits(run - 2, 8):
                    seq.append((17, d - 1, 3))
        else:
            seq.append((ln, 0, 0))
            rep = run - 1
            if rep < 3:
                seq.extend((ln, 0, 0) for _ in range(rep))
            else:
                for d in _bij_digits(rep - 2, 4):
                    seq.append((16, d - 1, 2))
        sym += run
    return seq


def _write_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code (RFC 3.4/3.5) for the given symbol
    frequencies; returns the symbol -> (bits, nbits) encode map."""
    if not freqs:
        freqs = {0: 1}  # category unused: cheapest valid placeholder
    syms = sorted(freqs)
    alpha_bits = max(1, (alphabet - 1).bit_length())

    if len(syms) <= 4:
        # simple form
        bw.write(1, 2)  # HSKIP=1
        n = len(syms)
        bw.write(n - 1, 2)
        by_freq = sorted(syms, key=lambda s: (-freqs[s], s))
        if n == 1:
            bw.write(syms[0], alpha_bits)
            return {syms[0]: (0, 0)}
        if n == 2:
            for s in syms:
                bw.write(s, alpha_bits)
            return _canonical_codes({syms[0]: 1, syms[1]: 1})
        if n == 3:
            order = [by_freq[0]] + sorted(by_freq[1:])
            for s in order:
                bw.write(s, alpha_bits)
            return _canonical_codes(
                {order[0]: 1, order[1]: 2, order[2]: 2}
            )
        # n == 4: flat (2,2,2,2) vs skewed (1,2,3,3) by actual cost
        f = [freqs[s] for s in by_freq]
        flat_cost = 2 * sum(f)
        skew_cost = f[0] + 2 * f[1] + 3 * (f[2] + f[3])
        if skew_cost < flat_cost:
            order = by_freq[:2] + sorted(by_freq[2:])
            for s in order:
                bw.write(s, alpha_bits)
            bw.write(1, 1)  # tree-select: skewed
            return _canonical_codes(
                {order[0]: 1, order[1]: 2, order[2]: 3, order[3]: 3}
            )
        for s in syms:
            bw.write(s, alpha_bits)
        bw.write(0, 1)  # tree-select: flat
        return _canonical_codes(dict.fromkeys(syms, 2))

    # complex form
    lengths = _limited_lengths(freqs, 15)
    seq = _length_sequence(lengths)
    clc_freqs: dict[int, int] = {}
    for s, _, _ in seq:
        clc_freqs[s] = clc_freqs.get(s, 0) + 1
    clc_lengths = _limited_lengths(clc_freqs, 5)
    clc_codes = _canonical_codes(clc_lengths)

    bw.write(0, 2)  # HSKIP=0: complex form
    # lengths of the code-length code, in _CLC_ORDER, fixed code;
    # stop exactly when the CLC becomes complete (the decoder stops
    # reading there) — unless it is a single-symbol CLC, in which
    # case the decoder reads all 18 positions.
    space = 32
    n_used = sum(1 for ln in clc_lengths.values() if ln)
    for i, sym in enumerate(_CLC_ORDER):
        ln = clc_lengths.get(sym, 0)
        pat, nb = _CLC_FIXED[ln]
        bw.write(pat, nb)
        if ln:
            space -= 32 >> ln
            if space <= 0 and n_used > 1:
                break
    assert space == 0 or n_used == 1, "incomplete code-length code"

    for s, extra, ebits in seq:
        pat, nb = clc_codes[s]
        bw.write(pat, nb)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _len_code(codes: tuple[tuple[int, int], ...], value: int) -> int:
    """Index of the (base, extra-bits) range containing ``value``."""
    lo, hi = 0, len(codes) - 1
    while lo < hi:
        mid = (lo + hi + 1) >> 1
        if codes[mid][0] <= value:
            lo = mid
        else:
            hi = mid - 1
    return lo


def _dist_symbol(distance: int) -> tuple[int, int, int]:
    """Distance -> (symbol, extra value, extra bits) with NPOSTFIX=0,
    NDIRECT=0 (inverse of the decoder's long-distance formula)."""
    v = distance + 3  # = (2 + (x & 1)) << nbits | extra, v >= 4
    nbits = v.bit_length() - 2
    hi = v >> nbits  # 2 or 3
    extra = v & ((1 << nbits) - 1)
    x = ((nbits - 1) << 1) | (hi - 2)
    return 16 + x, extra, nbits


# --- static-dictionary matching (r8; RFC 7932 section 8) ------------------
#
# Identity transform only (transform_id 0): a match of length L at
# stream position p is encoded as distance
# ``min(p, window) + 1 + word_index`` — exactly the decoder's
# ``word_idx = distance - max_dist - 1`` inverse with tid 0.  Word
# lengths 4..24 all have dictionary classes (DICT_SIZE_BITS nonzero),
# and the resulting distances stay inside the NPOSTFIX=0 NDIRECT=0
# 64-symbol distance alphabet (window + 2^11 < (2+1)<<24).
#
# Probe policy (mirrored BYTE-IDENTICALLY by the JVM encoder in
# BroHuffman.lzParse — change both or neither):
#   - only at quality >= _DICT_QUALITY;
#   - only where the previous byte is non-alphanumeric (word
#     boundary) — dictionary words are word-aligned tokens, and this
#     caps probe volume at ~1/word;
#   - only when the next 4 bytes prefix SOME dictionary word (one
#     set lookup before the length scan);
#   - lengths scan LONGEST-first down to lz_len+1, first hit wins;
#     within a length class the FIRST occurrence of a duplicated word
#     keeps the lowest index.

_DICT_QUALITY = 5
# One-position lazy matching from this quality up (r9): defer an LZ
# match when position+1 has a strictly longer candidate. Quality 7
# mirrors libbrotli's own greedy->lazy handoff point.
_LAZY_QUALITY = 7

_dict_index_cache: tuple[dict[bytes, int], set[bytes]] | None = None


def _dict_index() -> tuple[dict[bytes, int], set[bytes]]:
    """(word bytes -> index-within-its-length-class, 4-byte-prefix
    set).  ~13.5k words, built once per process."""
    global _dict_index_cache
    if _dict_index_cache is None:
        data = _dict_data()
        words: dict[bytes, int] = {}
        prefixes: set[bytes] = set()
        for length in range(4, 25):
            sbits = DICT_SIZE_BITS_BY_LENGTH[length]
            if sbits == 0:
                continue
            base = DICT_OFFSETS_BY_LENGTH[length]
            for idx in range(1 << sbits):
                w = data[base + length * idx : base + length * (idx + 1)]
                if w not in words:  # first occurrence wins
                    words[w] = idx
                prefixes.add(w[:4])
        _dict_index_cache = (words, prefixes)
    return _dict_index_cache


def _is_alnum(b: int) -> bool:
    return (
        (0x61 <= b <= 0x7A) or (0x41 <= b <= 0x5A) or (0x30 <= b <= 0x39)
    )


def _lz_parse(
    data: bytes,
    max_dist: int,
    base_pos: int = 0,
    use_dict: bool = False,
    lazy: bool = False,
) -> list[tuple[int, int, int, int]]:
    """Greedy LZ77: [(lit_start, lit_end, copy_len, distance), ...].
    The final command may be insert-only (copy_len 0).  Matches are
    4+ bytes, found via a last-position hash table on 4-byte keys;
    overlapping copies (distance < length) are produced naturally.
    With ``use_dict``, static-dictionary matches STRICTLY longer than
    the LZ candidate are emitted as beyond-window distances
    (``base_pos`` = stream bytes before ``data``, needed because the
    decoder's max_dist is a stream-wide position).  With ``lazy``
    (quality >= {_LAZY_QUALITY}), a one-position lookahead defers an
    LZ match when the NEXT position's last-table candidate extends
    strictly longer (zlib-style lazy matching, r9) — the deferred
    byte joins the literal run and the longer match wins. The probe
    reads the table only (the current key was already recorded), so
    the JVM parse mirrors it BYTE-IDENTICALLY (change both or
    neither)."""
    n = len(data)
    cmds: list[tuple[int, int, int, int]] = []
    table: dict[bytes, int] = {}
    if use_dict:
        dwords, dprefixes = _dict_index()
    lit_start = 0
    pos = 0
    while pos + 4 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        m = 0
        if cand is not None and pos - cand <= max_dist:
            m = 4
            while pos + m < n and data[cand + m] == data[pos + m]:
                m += 1
        if (
            use_dict
            and (pos == 0 or not _is_alnum(data[pos - 1]))
            and key in dprefixes
        ):
            lmax = min(24, n - pos)
            dict_hit = False
            for length in range(lmax, max(4, m + 1) - 1, -1):
                idx = dwords.get(data[pos : pos + length])
                if idx is not None:
                    d = min(base_pos + pos, max_dist) + 1 + idx
                    cmds.append((lit_start, pos, length, d))
                    pos += length
                    lit_start = pos
                    dict_hit = True
                    break
            if dict_hit:
                continue
        if m:
            if lazy and pos + 5 <= n:
                cand2 = table.get(data[pos + 1 : pos + 5])
                if cand2 is not None and pos + 1 - cand2 <= max_dist:
                    m2 = 4
                    while (
                        pos + 1 + m2 < n
                        and data[cand2 + m2] == data[pos + 1 + m2]
                    ):
                        m2 += 1
                    if m2 > m:
                        pos += 1  # defer: byte becomes a literal
                        continue
            cmds.append((lit_start, pos, m, pos - cand))
            pos += m
            lit_start = pos
        else:
            pos += 1
    if lit_start < n or not cmds:
        cmds.append((lit_start, n, 0, 0))
    return cmds


def _encode_metablock(
    bw: _BitWriter, chunk: bytes, islast: bool, quality: int,
    base_pos: int = 0,
) -> None:
    """Emit one metablock for ``chunk`` (1..16 MiB): compressed with
    the trivial header shape, or uncompressed if that is smaller.
    ``base_pos`` = stream bytes before this chunk (static-dictionary
    distances are relative to the stream-wide position)."""
    mlen = len(chunk)

    if quality <= 0:
        cmds = [(0, mlen, 0, 0)]
    else:
        cmds = _lz_parse(
            chunk,
            _MAX_DIST,
            base_pos,
            use_dict=quality >= _DICT_QUALITY,
            lazy=quality >= _LAZY_QUALITY,
        )

    # --- gather symbol statistics ------------------------------------
    lit_freqs: dict[int, int] = {}
    cmd_freqs: dict[int, int] = {}
    dist_freqs: dict[int, int] = {}
    encoded: list[tuple[int, tuple, tuple, int, int, tuple]] = []
    for ls, le, copy_len, distance in cmds:
        ins_len = le - ls
        ic = _len_code(_INSERT_CODES, ins_len)
        i_base, i_extra = _INSERT_CODES[ic]
        if copy_len:
            cc = _len_code(_COPY_CODES, copy_len)
            c_base, c_extra = _COPY_CODES[cc]
            ds, d_extra_v, d_extra_n = _dist_symbol(distance)
            dist_freqs[ds] = dist_freqs.get(ds, 0) + 1
            dist_part = (ds, d_extra_v, d_extra_n)
        else:
            cc, c_base, c_extra = 0, 2, 0  # ignored by the decoder
            dist_part = None
        cell = _CELL_OF[(ic >> 3, cc >> 3)]
        sym = (cell << 6) | ((ic & 7) << 3) | (cc & 7)
        cmd_freqs[sym] = cmd_freqs.get(sym, 0) + 1
        for b in chunk[ls:le]:
            lit_freqs[b] = lit_freqs.get(b, 0) + 1
        encoded.append(
            (
                sym,
                (ins_len - i_base, i_extra),
                (copy_len - c_base if copy_len else 0, c_extra),
                ls,
                le,
                dist_part,
            )
        )

    # --- encode into a scratch writer so we can fall back ------------
    body = _BitWriter()
    body.write(0, 1)  # NBLTYPESL = 1
    body.write(0, 1)  # NBLTYPESI = 1
    body.write(0, 1)  # NBLTYPESD = 1
    body.write(0, 2)  # NPOSTFIX = 0
    body.write(0, 4)  # NDIRECT = 0
    body.write(0, 2)  # context mode 0 (irrelevant: one literal tree)
    body.write(0, 1)  # NTREESL = 1
    body.write(0, 1)  # NTREESD = 1
    lit_codes = _write_prefix_code(body, lit_freqs, 256)
    cmd_codes = _write_prefix_code(body, cmd_freqs, 704)
    dist_codes = _write_prefix_code(body, dist_freqs, 64)
    for sym, (iv, ib), (cv, cb), ls, le, dist_part in encoded:
        pat, nb = cmd_codes[sym]
        body.write(pat, nb)
        if ib:
            body.write(iv, ib)
        if cb:
            body.write(cv, cb)
        for b in chunk[ls:le]:
            pat, nb = lit_codes[b]
            body.write(pat, nb)
        if dist_part is not None:
            ds, dv, dn = dist_part
            pat, nb = dist_codes[ds]
            body.write(pat, nb)
            if dn:
                body.write(dv, dn)
    complete = body.take()
    nbits = len(complete) * 8 + body._n
    if body._n:
        complete += bytes([body._acc & 0xFF])

    # --- choose form and emit into the real stream -------------------
    if len(complete) >= mlen:
        # incompressible: non-last UNCOMPRESSED metablock (a final
        # empty metablock terminates the stream when needed)
        bw.write(0, 1)  # ISLAST = 0
        _write_mlen(bw, mlen)
        bw.write(1, 1)  # ISUNCOMPRESSED
        bw.align()
        bw.raw(chunk)
        if islast:
            bw.write(1, 1)  # ISLAST
            bw.write(1, 1)  # ISLASTEMPTY
        return

    bw.write(1 if islast else 0, 1)
    if islast:
        bw.write(0, 1)  # ISLASTEMPTY = 0
    _write_mlen(bw, mlen)
    if not islast:
        bw.write(0, 1)  # ISUNCOMPRESSED = 0
    # replay the scratch body bit-exactly (only the true bit length)
    data_int = int.from_bytes(complete, "little")
    step = 32
    for off in range(0, nbits, step):
        take = min(step, nbits - off)
        bw.write((data_int >> off) & ((1 << take) - 1), take)


def _write_mlen(bw: _BitWriter, mlen: int) -> None:
    v = mlen - 1
    if v < 1 << 16:
        nibbles = 4
    elif v < 1 << 20:
        nibbles = 5
    else:
        nibbles = 6
    bw.write(nibbles - 4, 2)  # MNIBBLES
    bw.write(v, 4 * nibbles)


class PureBrotliCompressor:
    """Streaming pure-Python brotli encoder with the same
    ``compress`` / ``finish`` surface as the wheel/ctypes backends.
    Memory is bounded by one metablock (``_BLOCK`` input bytes)."""

    def __init__(self, quality: int = 1, dictionary: bytes | None = None):
        if dictionary:
            raise NotImplementedError(
                "the pure-Python brotli encoder has no custom-"
                "dictionary support (install the brotli wheel or a "
                "system libbrotli for dictionary writes)"
            )
        self._quality = quality
        self._bw = _BitWriter()
        self._buf = bytearray()
        self._header = False
        self._finished = False
        self._pos = 0  # stream bytes already encoded (dict distances)

    def _ensure_header(self) -> None:
        if not self._header:
            # WBITS=22: '1' then (22-17) in 3 bits
            self._bw.write(1, 1)
            self._bw.write(_WBITS - 17, 3)
            self._header = True

    def compress(self, data: bytes) -> bytes:
        assert not self._finished
        self._buf += data
        if len(self._buf) < _BLOCK:
            return b""
        self._ensure_header()
        while len(self._buf) >= _BLOCK:
            chunk = bytes(self._buf[:_BLOCK])
            del self._buf[:_BLOCK]
            _encode_metablock(self._bw, chunk, islast=False,
                              quality=self._quality, base_pos=self._pos)
            self._pos += len(chunk)
        return self._bw.take()

    def finish(self) -> bytes:
        assert not self._finished
        self._finished = True
        self._ensure_header()
        if self._buf:
            _encode_metablock(self._bw, bytes(self._buf), islast=True,
                              quality=self._quality, base_pos=self._pos)
            self._pos += len(self._buf)
            del self._buf[:]
        else:
            self._bw.write(1, 1)  # ISLAST
            self._bw.write(1, 1)  # ISLASTEMPTY
        self._bw.align()
        return self._bw.take()


def brotli_compress(data: bytes, quality: int = 1) -> bytes:
    """One-shot pure-Python brotli compression."""
    c = PureBrotliCompressor(quality)
    return c.compress(data) + c.finish()
