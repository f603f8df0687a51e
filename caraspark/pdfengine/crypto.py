"""Standard security handler decryption (SURVEY.md C18; ISO 32000-1 §7.6).

Capability parity: caradoc ``src/crypto/crypto.ml`` [P?] — revisions 2–4 of
the standard handler: MD5 key derivation (Algorithm 2), per-object keys,
RC4 (40/128-bit) and AESV2 (CBC, 16-byte IV prefix, PKCS#5 padding).
Empty-user-password documents only (validation-grade, like caradoc's usage).

RC4 is hand-rolled (modern crypto libs dropped it); AES uses the
``cryptography`` package, gated behind an import-try so the engine degrades
to a taxonomy error (`crypt.unsupported`) instead of an ImportError.
"""

from __future__ import annotations

import hashlib
import struct

from caraspark.pdfengine.model import Name, PdfError, Ref, Stream

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
    except ImportError:
        return None
    if len(key) not in (16, 24, 32):
        # a corrupt /Length can shorten the derived key below AES's
        # minimum; surface as crypt.unsupported (None), never a raise
        return None
    if len(data) < 32 or len(data) % 16:
        return b""
    iv, body = data[:16], data[16:]
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    plain = dec.update(body) + dec.finalize()
    padlen = plain[-1] if plain else 0
    if 1 <= padlen <= 16:
        plain = plain[:-padlen]
    return plain


def _aes_cbc_raw(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes | None:
    """AES-CBC without padding (R5/R6 key wrapping + hash rounds)."""
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
    except ImportError:
        return None
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes | None:
    """ISO 32000-2 Algorithm 2.B (revision 6 iterated hash)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        i += 1
        k1 = (password + k + udata) * 64
        e = _aes_cbc_raw(k[:16], k[16:32], k1, encrypt=True)
        if e is None:
            return None
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def file_key(enc: dict, file_id: bytes, errors: list) -> tuple[bytes, str] | None:
    """Algorithm 2 with the empty user password → (key, cipher kind)."""
    filt = enc.get("Filter")
    if filt != Name("Standard"):
        errors.append(PdfError("crypt.unsupported", msg=str(filt)))
        return None
    r = enc.get("R")
    v = enc.get("V", 0)
    o = enc.get("O")
    p = enc.get("P")
    if not isinstance(r, int) or not isinstance(o, bytes) or not isinstance(p, int):
        errors.append(PdfError("crypt.bad_encrypt_dict"))
        return None
    if r in (5, 6):
        return _file_key_v5(enc, r, errors)
    if r not in (2, 3, 4):
        errors.append(PdfError("crypt.unsupported", msg=f"R={r}"))
        return None
    nbytes = 5
    if r >= 3:
        length = enc.get("Length", 40)
        if not isinstance(length, int) or isinstance(length, bool):
            errors.append(PdfError("crypt.bad_encrypt_dict", msg="Length"))
            length = 40
        nbytes = max(5, min(16, length // 8))

    h = hashlib.md5()
    h.update(PAD)  # empty user password → the pad alone
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(file_id)
    if r >= 4 and enc.get("EncryptMetadata") is False:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    key = key[:nbytes]

    cipher = "rc4"
    if v == 4:
        cf = enc.get("CF")
        stmf = enc.get("StmF", Name("Identity"))
        if isinstance(cf, dict) and isinstance(stmf, Name):
            entry = cf.get(stmf.v)
            if isinstance(entry, dict) and entry.get("CFM") == Name("AESV2"):
                cipher = "aesv2"
    _check_user_password(enc, key, file_id, r, cipher, errors)
    return key, cipher


def _check_user_password(enc, key, file_id, r, cipher, errors) -> None:
    """Algorithm 6: verify /U matches the empty user password."""
    u = enc.get("U")
    if not isinstance(u, bytes):
        return
    if r == 2:
        expect = rc4(key, PAD)
        ok = u[:32] == expect
    else:
        h = hashlib.md5(PAD + file_id).digest()
        x = rc4(key, h)
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        ok = u[:16] == x
    if not ok:
        errors.append(PdfError("crypt.auth_failed", msg="user password"))


def _file_key_v5(enc: dict, r: int, errors: list) -> tuple[bytes, str] | None:
    """AES-256 revisions: 5 (deprecated AESV3) and 6 (ISO 32000-2).
    Empty user password: validate against /U, unwrap the key from /UE."""
    u = enc.get("U")
    ue = enc.get("UE")
    # /UE must hold a full 32-byte wrapped key; a truncated value (corrupt
    # or hostile input) would otherwise blow up AES-CBC on block alignment
    if (
        not isinstance(u, bytes)
        or len(u) < 48
        or not isinstance(ue, bytes)
        or len(ue) < 32
    ):
        errors.append(PdfError("crypt.bad_encrypt_dict", msg=f"R={r}"))
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        hv = hash_r6(b"", vsalt)
        ik = hash_r6(b"", ksalt)
    else:
        hv = hashlib.sha256(vsalt).digest()  # empty pw + validation salt
        ik = hashlib.sha256(ksalt).digest()
    if hv is None or ik is None:
        errors.append(PdfError("crypt.unsupported", msg="no AES backend"))
        return None
    if hv != u[:32]:
        errors.append(PdfError("crypt.auth_failed", msg="user password"))
    fkey = _aes_cbc_raw(ik, b"\x00" * 16, ue[:32], encrypt=False)
    if fkey is None:
        errors.append(PdfError("crypt.unsupported", msg="no AES backend"))
        return None
    return fkey, "aesv3"


def object_key(key: bytes, num: int, gen: int, cipher: str) -> bytes:
    if cipher == "aesv3":  # AES-256 uses the file key directly [§7.6.3.1]
        return key
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if cipher == "aesv2":
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


def decrypt_bytes(data: bytes, okey: bytes, cipher: str) -> bytes | None:
    if cipher == "rc4":
        return rc4(okey, data)
    return _aes_cbc_decrypt(okey, data)


def decrypt_document(doc, errors: list) -> None:
    """Decrypt all strings and stream payloads in place (Algorithm 1).

    Exempt: the /Encrypt dictionary, the trailer /ID strings, and xref
    streams (never encrypted per spec)."""
    trailer = doc.trailer
    enc_ref = trailer.get("Encrypt")
    enc = (
        doc.objects.get((enc_ref.num, enc_ref.gen))
        if isinstance(enc_ref, Ref)
        else enc_ref
    )
    if not isinstance(enc, dict):
        errors.append(PdfError("crypt.bad_encrypt_dict"))
        return
    ids = trailer.get("ID")
    file_id = ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
    fk = file_key(enc, file_id, errors)
    if fk is None:
        return
    key, cipher = fk
    enc_key = (enc_ref.num, enc_ref.gen) if isinstance(enc_ref, Ref) else None

    str_fail_reported = False

    def walk_strings(o, okey):
        nonlocal str_fail_reported
        if isinstance(o, bytes):
            out = decrypt_bytes(o, okey, cipher)
            if out is None and not str_fail_reported:
                # keep ciphertext, but say so (once per document)
                str_fail_reported = True
                errors.append(
                    PdfError("crypt.unsupported", msg=f"strings/{cipher}")
                )
            return o if out is None else out
        if isinstance(o, list):
            return [walk_strings(x, okey) for x in o]
        if isinstance(o, dict):
            return {k: walk_strings(v, okey) for k, v in o.items()}
        return o

    for k in sorted(doc.objects):
        if k == enc_key:
            continue
        o = doc.objects[k]
        okey = object_key(key, k[0], k[1], cipher)
        if isinstance(o, Stream):
            if o.d.get("Type") == Name("XRef"):
                continue
            o.d = walk_strings(o.d, okey)
            dec = decrypt_bytes(o.raw, okey, cipher)
            if dec is None:
                errors.append(PdfError("crypt.unsupported", obj=k, msg=cipher))
            else:
                o.raw = dec
        else:
            doc.objects[k] = walk_strings(o, okey)
