"""Tests for the stub image codec and the deterministic fixtures."""

import numpy as np
import pyarrow as pa

from planetiler_ray import codec, fixtures


class TestCodec:
    def test_png_lossless(self):
        px = fixtures.make_pixels(7, 32, 16)
        blob = codec.encode_image(px, "png")
        out = codec.decode_image(blob)
        assert (out == px).all()
        assert codec.psnr(px, out) == float("inf")

    def test_jpeg_psnr_over_40(self):
        px = fixtures.make_pixels(8, 64, 48)
        out = codec.decode_image(codec.encode_image(px, "jpeg"))
        assert out.shape == px.shape
        p = codec.psnr(px, out)
        assert 40.0 < p < 60.0

    def test_deterministic(self):
        a = codec.encode_image(fixtures.make_pixels(3, 16, 16), "png")
        b = codec.encode_image(fixtures.make_pixels(3, 16, 16), "png")
        assert a == b

    def test_phash_near_dup(self):
        px = fixtures.make_pixels(9, 64, 48)
        h1 = codec.phash64(px)
        h2 = codec.phash64(codec.decode_image(codec.encode_image(px, "jpeg")))
        ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
        assert ham <= 8  # jpeg-quantized copy is a near-duplicate
        other = codec.phash64(fixtures.make_pixels(10, 64, 48))
        assert bin((h1 ^ other) & ((1 << 64) - 1)).count("1") > 8


class TestFixtures:
    def test_schema(self):
        t = fixtures.images_table(20)
        assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        assert t.schema.field("bytes").type == pa.binary()
        assert t.schema.field("w").type == pa.int32()
        assert t["image_id"][0].as_py() == "img00000000"
        assert t["fmt"][0].as_py() == "png" and t["fmt"][1].as_py() == "jpeg"

    def test_bytes_roundtrip(self):
        t = fixtures.images_table(6)
        for i in range(6):
            px = codec.decode_image(t["bytes"][i].as_py())
            assert px.shape == (t["h"][i].as_py(), t["w"][i].as_py(), 3)

    def test_georef_deterministic_and_in_range(self):
        ids = fixtures.image_ids(1000)
        g = fixtures.georef_from_ids(ids)
        g2 = fixtures.georef_from_ids(ids)
        assert (g["cx"] == g2["cx"]).all() and (g["cy"] == g2["cy"]).all()
        assert (g["cx"] >= 0).all() and (g["cx"] <= 1.0).all()
        assert (g["cy"] >= -0.1).all() and (g["cy"] <= 1.1).all()

    def test_georef_hotspots(self):
        ids = fixtures.image_ids(2000)
        g = fixtures.georef_from_ids(ids)
        i = g["idx"]
        hot = (i % 10) < 3
        # hotspot images cluster into 5 tiny boxes → few distinct z10 tiles
        from planetiler_ray.tilemath import tile_of_point
        tx, ty = tile_of_point(g["cx"][hot], g["cy"][hot], 10)
        assert len(set(zip(tx.tolist(), ty.tolist()))) < 50
        txc, tyc = tile_of_point(g["cx"][~hot], g["cy"][~hot], 10)
        assert len(set(zip(txc.tolist(), tyc.tolist()))) > 1000

    def test_georef_antimeridian(self):
        ids = fixtures.image_ids(300)
        g = fixtures.georef_from_ids(ids)
        wrap = (g["idx"] % 97) == 0
        assert wrap.sum() >= 3
        assert ((g["cx"] + g["hw"])[wrap] > 1.0).all()
