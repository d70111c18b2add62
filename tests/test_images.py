

def test_png_dims_header_only_matches_decoder():
    """png_dims reads width/height from IHDR alone (the decode_images
    metadata path — the jpeg_dims twin, r15) and rejects the same
    unsupported inputs as the full decoder."""
    import struct

    import pytest

    from etl_instagram_spark.multimodal.png import (
        decode_png,
        encode_png,
        png_dims,
    )

    for w, h in [(1, 1), (24, 17), (64, 64)]:
        data = encode_png(w, h, bytes((x % 251 for x in range(w * h * 3))))
        d = decode_png(data)
        assert png_dims(data) == (d["width"], d["height"]) == (w, h)
    good = encode_png(8, 8, bytes(192))
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12 body)
    bad = good[:28] + b"\x01" + good[29:]
    with pytest.raises(ValueError, match="interlaced"):
        png_dims(bad)
    with pytest.raises(ValueError, match="PNG"):
        png_dims(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(TypeError):
        png_dims("not bytes")
