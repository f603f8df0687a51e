"""Stream filters (SURVEY.md C13–C16; ISO 32000-1 §7.4).

Capability parity: caradoc's ``src/stream/`` filter set [P?] — FlateDecode,
ASCIIHexDecode, ASCII85Decode, RunLengthDecode, plus TIFF/PNG predictor undo;
beyond it, LZWDecode [PDF17 §7.4.4] with /EarlyChange (the remaining
non-image filter family of the spec).
Implementation: zlib/binascii/base64 (C-speed) per stream; predictors in
NumPy — Sub/Up/Average vectorize per row; Paeth is row-sequential but
column-vectorized.

A filter failure never throws past this module: it records a taxonomy error
and yields None, so one corrupt stream can't kill an Arrow batch.
"""

from __future__ import annotations

import base64
import binascii
import zlib

import numpy as np

from caraspark.pdfengine.model import Name, PdfError, Ref

SUPPORTED = {
    "FlateDecode",
    "LZWDecode",
    "ASCIIHexDecode",
    "ASCII85Decode",
    "RunLengthDecode",
}
_ALIASES = {  # PDF 1.1 short forms [PDF17 Table H.1]
    "Fl": "FlateDecode",
    "LZW": "LZWDecode",
    "AHx": "ASCIIHexDecode",
    "A85": "ASCII85Decode",
    "RL": "RunLengthDecode",
}


def decode_stream(
    raw: bytes,
    sdict: dict,
    errors: list,
    objkey: tuple[int, int] | None = None,
    resolver=None,
    max_decoded: int = 256 * 1024 * 1024,
) -> bytes | None:
    """Apply the full /Filter chain (with /DecodeParms) in order."""
    filters = sdict.get("Filter")
    if isinstance(filters, Ref) and resolver:
        filters = resolver(filters)
    if filters is None:
        return raw
    if isinstance(filters, Name):
        filters = [filters]
    parms = sdict.get("DecodeParms", sdict.get("DP"))
    if isinstance(parms, Ref) and resolver:
        parms = resolver(parms)
    if parms is None or isinstance(parms, dict):
        parms = [parms] * len(filters)
    if not isinstance(filters, list):
        errors.append(PdfError("filter.bad_filter_entry", obj=objkey))
        return None

    data = raw
    for i, f in enumerate(filters):
        if isinstance(f, Ref) and resolver:
            f = resolver(f)
        if not isinstance(f, Name):
            errors.append(PdfError("filter.bad_filter_entry", obj=objkey))
            return None
        name = _ALIASES.get(f.v, f.v)
        p = parms[i] if i < len(parms) else None
        if isinstance(p, Ref) and resolver:
            p = resolver(p)
        data = _apply_one(data, name, p, errors, objkey, resolver)
        if data is None:
            return None
        if len(data) > max_decoded:
            errors.append(PdfError("resource.decoded_too_large", obj=objkey))
            return None
    return data


def _apply_one(data, name, parms, errors, objkey, resolver):
    try:
        if name == "FlateDecode":
            out = zlib.decompress(data)
            return _undo_predictor(out, parms, errors, objkey, resolver)
        if name == "LZWDecode":
            early = _get_int(parms, "EarlyChange", 1, resolver)
            out = _lzw(data, early=1 if early else 0)
            return _undo_predictor(out, parms, errors, objkey, resolver)
        if name == "ASCIIHexDecode":
            return _ascii_hex(data)
        if name == "ASCII85Decode":
            return _ascii_85(data)
        if name == "RunLengthDecode":
            return _run_length(data)
        if name in ("Crypt",):
            # Identity crypt filter only (decryption happens upstream)
            return data
        errors.append(PdfError("filter.unsupported", obj=objkey, msg=name))
        return None
    except Exception as e:  # noqa: BLE001 — corrupt payloads are data, not bugs
        errors.append(
            PdfError(f"filter.{name.lower().replace('decode','')}_error",
                     obj=objkey, msg=str(e)[:80])
        )
        return None


def _ascii_hex(data: bytes) -> bytes:
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    compact = bytes(c for c in data if c not in b"\x00\t\n\x0c\r ")
    if len(compact) % 2:
        compact += b"0"
    return binascii.unhexlify(compact)


def _ascii_85(data: bytes) -> bytes:
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    compact = bytes(c for c in data if c not in b"\x00\t\n\x0c\r ")
    if compact.startswith(b"<~"):
        compact = compact[2:]
    return base64.a85decode(compact, adobe=False)


def _lzw(data: bytes, early: int = 1) -> bytes:
    """LZWDecode [PDF17 §7.4.4]: MSB-first variable-width codes (9→12 bits),
    256=clear-table, 257=EOD; /EarlyChange (default 1) widens the code one
    entry before the table fills, matching the TIFF-heritage encoders."""
    CLEAR, EOD = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    buf = 0
    nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == CLEAR:
                table = list(base)
                width = 9
                prev = None
                continue
            if code == EOD:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("lzw: bad initial code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK special case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("lzw: code beyond table")
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _run_length(data: bytes) -> bytes:
    """Length-byte protocol [PDF17 §7.4.5]: l<128 copy l+1; l>128 repeat
    next byte 257-l times; l==128 EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 >= n:
                raise ValueError("runlength: truncated repeat")
            out += data[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _get_int(d, key, default, resolver):
    v = d.get(key, default) if isinstance(d, dict) else default
    if isinstance(v, Ref) and resolver:
        v = resolver(v)
    return v if isinstance(v, int) else default


def _undo_predictor(data, parms, errors, objkey, resolver):
    """TIFF predictor 2 and PNG predictors 10–15 [PDF17 §7.4.4.4]."""
    if not isinstance(parms, dict):
        return data
    pred = _get_int(parms, "Predictor", 1, resolver)
    if pred <= 1:
        return data
    colors = _get_int(parms, "Colors", 1, resolver)
    bpc = _get_int(parms, "BitsPerComponent", 8, resolver)
    columns = _get_int(parms, "Columns", 1, resolver)
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    rowlen = (columns * colors * bpc + 7) // 8

    if pred == 2:  # TIFF horizontal differencing (8-bit path)
        if bpc != 8:
            errors.append(PdfError("filter.predictor_unsupported", obj=objkey,
                                   msg=f"tiff bpc={bpc}"))
            return None
        arr = np.frombuffer(data, dtype=np.uint8).copy()
        nrows = len(arr) // rowlen
        arr = arr[: nrows * rowlen].reshape(nrows, rowlen)
        # cumulative sum per color channel along the row (mod 256)
        for c in range(bpp):
            arr[:, c::bpp] = np.cumsum(arr[:, c::bpp], axis=1, dtype=np.int64) & 0xFF
        return arr.tobytes()

    if 10 <= pred <= 15:  # PNG: per-row tag byte then filtered bytes
        stride = rowlen + 1
        n = len(data) // stride
        if n * stride != len(data):
            errors.append(PdfError("filter.predictor_len", obj=objkey))
            data = data[: n * stride]
        raw = np.frombuffer(data, dtype=np.uint8).reshape(n, stride)
        tags = raw[:, 0]
        rows = raw[:, 1:].astype(np.int64)
        prev = np.zeros(rowlen, dtype=np.int64)
        out = np.empty((n, rowlen), dtype=np.uint8)
        for r in range(n):
            row = rows[r]
            t = tags[r]
            if t == 0:
                cur = row & 0xFF
            elif t == 1:  # Sub
                cur = row.copy()
                for i in range(bpp, rowlen):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            elif t == 2:  # Up — fully vectorized
                cur = (row + prev) & 0xFF
            elif t == 3:  # Average
                cur = row.copy()
                for i in range(rowlen):
                    left = cur[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif t == 4:  # Paeth
                cur = row.copy()
                for i in range(rowlen):
                    a = cur[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    cur[i] = (cur[i] + pr) & 0xFF
            else:
                raise ValueError(f"png predictor tag {t}")
            out[r] = cur
            prev = cur.astype(np.int64)
        return out.tobytes()

    errors.append(PdfError("filter.predictor_unsupported", obj=objkey, msg=str(pred)))
    return None
