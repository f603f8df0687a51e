

def test_media_parsers_total_on_truncated_payloads():
    """Hostile/truncated media bytes must classify unknown or be skipped,
    never raise out of the decode UDFs."""
    import random

    from caraspark.multimodal import encode_media, parse_header

    assert parse_header(b"")["kind"] == "unknown"
    assert parse_header(b"FIMG")["kind"] == "unknown"
    assert parse_header(b"FAUD\x00\x01")["kind"] == "unknown"
    assert parse_header(b"FVID\x00")["kind"] == "unknown"
    rng = random.Random(9)
    for mid in range(12):
        full = encode_media(mid)
        for _ in range(40):
            cut = rng.randrange(len(full) + 1)
            b = bytearray(full[:cut])
            if b and rng.random() < 0.5:
                b[rng.randrange(len(b))] = rng.randrange(256)
            r = parse_header(bytes(b))
            assert r["kind"] in ("image", "audio", "video", "unknown")
