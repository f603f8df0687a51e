

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


def test_media_shard_layout_budget_and_contiguity(spark, sf_smoke):
    """Shards partition each kind's id range contiguously; every shard
    except possibly the last stays within budget + one item's overflow
    (the bins-by-prefix rule); totals reconcile with media_meta."""
    from caraspark.multimodal import _SHARD_BYTES, media_meta, media_shard_layout

    meta = {
        (r.kind, r.media_id): r.n_bytes
        for r in media_meta(spark, sf_smoke)
        .select("kind", "media_id", "n_bytes")
        .collect()
    }
    by_kind = {}
    for r in media_shard_layout(spark, sf_smoke).collect():
        by_kind.setdefault(r.kind, []).append(r)
    for kind, rows in by_kind.items():
        rows.sort(key=lambda r: r.shard)
        ids = sorted(m for k, m in meta if k == kind)
        assert sum(r.n_items for r in rows) == len(ids)
        assert sum(r.total_bytes for r in rows) == sum(
            meta[(kind, m)] for m in ids
        )
        for a, b in zip(rows, rows[1:]):
            assert a.last_id < b.first_id  # contiguous, ordered
        # prefix rule: a shard's bytes_before span is < _SHARD_BYTES, so
        # total_bytes < budget + max item size in the shard
        for r in rows:
            max_item = max(
                meta[(kind, m)]
                for m in ids
                if r.first_id <= m <= r.last_id and (kind, m) in meta
            )
            assert r.total_bytes < _SHARD_BYTES + max_item
