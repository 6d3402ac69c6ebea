"""Tests for expression trees, scalar parsers, GeoJSON source, Profile."""

import json

import numpy as np
import pyarrow as pa
import pytest


class TestExpression:
    def _parts(self):
        return pa.table({
            "p_type": ["PROMO BRASS", "LARGE MEDIUM", "STANDARD", "MEDIUM X", None],
            "p_brand": ["Brand#1", "Brand#2", "Brand#3", "Brand#1", "Brand#2"],
            "p_size": [1, 5, 9, 3, 2],
        })

    def test_match_any_wildcards(self):
        from planetiler_ray.functions.expression import match_any
        t = self._parts()
        assert match_any("p_type", ["PROMO%"])(t).to_pylist() == \
            [True, False, False, False, False]
        assert match_any("p_type", ["%MEDIUM%"])(t).to_pylist() == \
            [False, True, False, True, False]
        assert match_any("p_type", ["%BRASS"])(t).to_pylist() == \
            [True, False, False, False, False]
        assert match_any("p_type", ["STANDARD"])(t).to_pylist() == \
            [False, False, True, False, False]

    def test_boolean_combinators(self):
        from planetiler_ray.functions.expression import and_, match_any, not_, or_
        t = self._parts()
        e = and_(or_(match_any("p_type", ["%MEDIUM%"]), match_any("p_type", ["PROMO%"])),
                 not_(match_any("p_brand", ["Brand#1"])))
        assert e(t).to_pylist() == [False, True, False, False, False]

    def test_cmp_and_match_field(self):
        from planetiler_ray.functions.expression import cmp, match_field
        t = self._parts()
        assert cmp("p_size", ">=", 5)(t).to_pylist() == [False, True, True, False, False]
        assert match_field("p_type")(t).to_pylist() == [True, True, True, True, False]


class TestParse:
    def test_parse_long(self):
        from planetiler_ray.functions.parse import parse_long
        out = parse_long(["42", " -7 houses", "x", "", "3.9"])
        assert out[0] == 42 and out[1] == -7 and np.isnan(out[2]) and out[4] == 3

    def test_parse_bool_direction(self):
        from planetiler_ray.functions.parse import parse_bool, parse_direction
        assert parse_bool(["yes", "TRUE", "1", "no", "maybe"]).tolist() == \
            [True, True, True, False, False]
        assert parse_direction(["yes", "-1", "no", "2"]).tolist() == [1, -1, 0, 0]

    def test_parse_meters(self):
        from planetiler_ray.functions.parse import parse_meters
        out = parse_meters(["12", "12.5 m", "10 ft", "1 mi", "2 km", "bogus"])
        assert out[0] == 12 and out[1] == 12.5
        assert out[2] == pytest.approx(3.048)
        assert out[3] == pytest.approx(1609.344)
        assert out[4] == 2000
        assert np.isnan(out[5])

    def test_way_z_order(self):
        from planetiler_ray.functions.parse import way_z_order
        z = way_z_order(["1", "0", None], ["yes", "no", "no"], ["no", "yes", "no"])
        assert z.tolist() == [20, -10, 0]


class TestGeoJsonSource:
    def test_read_geojson(self, ray_session, tmp_path):
        from planetiler_ray.sources.geojson import read_geojson
        feats = [
            {"type": "Feature", "properties": {"id": "a", "name": "pt"},
             "geometry": {"type": "Point", "coordinates": [0.0, 0.0]}},
            {"type": "Feature", "properties": {"id": "b"},
             "geometry": {"type": "Polygon", "coordinates": [[[-1, -1], [1, -1],
                                                              [1, 1], [-1, 1], [-1, -1]]]}},
            {"type": "Feature", "properties": {"id": "c"},
             "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}},
        ]
        p = tmp_path / "f.ndjson"
        p.write_text("\n".join(json.dumps(f) for f in feats))
        df = read_geojson(str(p)).to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        assert df["image_id"].tolist() == ["a", "b"]  # linestring skipped
        assert df["cx"][0] == pytest.approx(0.5) and df["cy"][0] == pytest.approx(0.5)
        assert df["hw"][1] == pytest.approx(2 / 360 / 2)

    def test_geojson_through_pyramid(self, ray_session, tmp_path):
        from planetiler_ray.sources.geojson import read_geojson
        from planetiler_ray.stages.render import RenderConfig, render_fanout
        feats = [{"type": "Feature", "properties": {"id": f"g{i}"},
                  "geometry": {"type": "Point", "coordinates": [i * 10.0, 20.0]}}
                 for i in range(5)]
        p = tmp_path / "pts.ndjson"
        p.write_text("\n".join(json.dumps(f) for f in feats))
        geo = read_geojson(str(p)).to_pandas()
        tbl = pa.Table.from_pandas(geo)
        out = render_fanout(tbl, RenderConfig(2, 2))
        assert out.num_rows >= 5


class TestProfile:
    def test_filtered_profile(self, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.functions.expression import match_any
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.profile import FilteredProfile
        from planetiler_ray.stages.render import RenderConfig
        n = 100
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        ids = fixtures.image_ids(n)
        prof = FilteredProfile(match_any("caption", ["%river%"]))
        tiles = build_pyramid(ds, ids, RenderConfig(3, 3), num_partitions=2,
                              profile=prof).to_pandas()
        caps = fixtures.captions(np.arange(n))
        n_river = sum("river" in c for c in caps)
        assert n_river > 0
        assert tiles["n_features"].sum() <= 2 * 2 * n_river  # 2 layers, ≤2 tiles/pt
        all_tiles = build_pyramid(ds, ids, RenderConfig(3, 3), num_partitions=2).to_pandas()
        assert tiles["n_features"].sum() < all_tiles["n_features"].sum()


class TestBoxMergeProfile:
    def test_merges_overlapping_boxes_per_tile(self, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.profile import BoxMergeProfile
        from planetiler_ray.stages.render import RenderConfig
        n = 200
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id"])
        ids = fixtures.image_ids(n)
        cfg = RenderConfig(14, 14, emit_points=False)
        plain = build_pyramid(ds, ids, cfg, num_partitions=4,
                              with_feature_ids=False).to_pandas()
        merged = build_pyramid(ds, ids, cfg, num_partitions=4,
                               with_feature_ids=False,
                               profile=BoxMergeProfile(min_dist=256.0)).to_pandas()
        # huge min_dist: every tile's boxes collapse to one merged feature
        assert (merged["n_features"] == 1).all()
        assert set(merged["tile_id"]) == set(plain["tile_id"])
        assert plain["n_features"].sum() >= merged["n_features"].sum()
        multi = plain[plain["n_features"] > 1]
        assert len(multi) > 0  # the hotspot fixture guarantees dense tiles


def test_translation_index_semantics(ray_session):
    """Provider order (Translations.java): own tag > wikidata > null;
    missing qids and languages resolve to null."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from planetiler_ray.functions.translations import (TranslationIndex,
                                                       translate_names)

    idx = TranslationIndex(
        np.array([1, 1, 2]), np.array(["en", "de", "en"], object),
        np.array(["one", "eins", "two"], object))
    assert idx.lookup("en", np.array([2, 1, 99])).tolist() == \
        ["two", "one", None]
    assert idx.lookup("xx", np.array([1])).tolist() == [None]

    ds = rd.from_arrow(pa.table({
        "wikidata_qid": pa.array([1, 2, 3], pa.int64()),
        "name_tag_de": pa.array(["own-de", None, None], pa.string()),
    }))
    out = translate_names(ds, idx, ("en", "de")).to_pandas() \
        .sort_values("wikidata_qid")
    assert out["name_en"].tolist() == ["one", "two", None]
    assert out["name_de"].tolist() == ["own-de", None, None]


def test_downloader_ranged_parallel(ray_session, tmp_path):
    """Ranged parallel download over file://: chunk assembly, resume
    skip, and size verification (Downloader.java semantics)."""
    import os

    from planetiler_ray.sources.downloader import download

    src = tmp_path / "src.bin"
    payload = bytes(range(256)) * 4096 + b"tail"      # 1 MiB + 4, odd size
    src.write_bytes(payload)
    dest = tmp_path / "out" / "dst.bin"

    r = download(f"file://{src}", str(dest), chunk_bytes=100_000, window=3)
    assert not r["skipped"] and r["bytes"] == len(payload)
    assert r["chunks"] == -(-len(payload) // 100_000)
    assert dest.read_bytes() == payload
    # resume: same size → skipped, content untouched
    r2 = download(f"file://{src}", str(dest), chunk_bytes=100_000)
    assert r2["skipped"]
    # corrupt size → re-downloaded
    dest.write_bytes(b"x")
    r3 = download(str(src), str(dest), chunk_bytes=100_000)
    assert not r3["skipped"] and dest.read_bytes() == payload
    assert not os.path.exists(str(dest) + ".part")


def test_language_utils(ray_session):
    """LanguageUtils semantics: valid name keys, latin detection,
    transliteration fallback through the actor-pool stage."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from planetiler_ray.functions.language import (Transliterate,
                                                   is_latin,
                                                   is_valid_name_key)

    keys = ["name:en", "name:de", "name:zh-Hans", "name:left",
            "name:etymology", "name:etymology:wikidata", "name:source",
            "name", "int_name", "name:fr-CA"]
    mask = is_valid_name_key(keys)
    assert mask.tolist() == [True, True, True, False, False,
                             False, False, False, False, True]

    assert is_latin(["Main St", "Ærø", "Москва", "Αθήνα", "", "café"]) \
        .tolist() == [True, True, False, False, False, True]

    ds = rd.from_arrow(pa.table({
        "name": pa.array(["Main St", "Москва", "Αθήνα", "café", None],
                         pa.string())}))
    out = ds.map_batches(Transliterate, batch_format="pyarrow",
                         concurrency=(1, 2)).to_pandas()
    got = dict(zip(out["name"], out["latin_name"]))
    assert got["Main St"] == "Main St"          # already latin: untouched
    assert got["Москва"] == "Moskva"
    assert got["Αθήνα"] == "Athina"
    assert got["café"] == "café"                # latin w/ diacritic: kept


def test_transliterate_nfkd_long_tail():
    """Codepoints beyond the curated table fold through stdlib NFKD
    (combining marks stripped): Vietnamese tone stacks, fullwidth
    forms, any Latin diacritic; CJK passes through unchanged (the
    documented non-ICU residue)."""
    from planetiler_ray.functions.language import Transliterate

    t = Transliterate()
    got = t.transliterate(["Việt Nam", "Ｔｏｋｙｏ", "Łódź", "𓀀", None])
    assert got == ["Viet Nam", "Tokyo", "Lodz", "𓀀", None]


def test_transliterate_cjk():
    """CJK transliteration (functions/cjk.py — the ICU Any-Latin
    stand-in): hangul decomposes algorithmically, kana folds through
    the Hepburn-ish scanner (digraphs, sokuon, chōon), common han
    codepoints map to toneless pinyin with ICU's syllable spacing;
    han outside the table passes through (documented residue)."""
    from planetiler_ray.functions.language import Transliterate

    t = Transliterate()
    cases = {
        # han → toneless pinyin, space-joined (ICU reads kanji as
        # pinyin too: 東京都 → dong jing du, not tokyo — same as ICU)
        "北京": "bei jing", "上海": "shang hai", "广州": "guang zhou",
        "重庆": "chong qing", "长城": "chang cheng", "東京都": "dong jing du",
        "富士山": "fu shi shan",
        # hangul → jamo-letter romanization (reversible convention)
        "서울": "seoul", "부산": "busan", "평양": "pyeongyang",
        "한국": "hangug",
        # kana → romaji with digraphs / gemination / prolonged mark
        "ひろしま": "hiroshima", "さっぽろ": "sapporo", "きょうと": "kyouto",
        "しんじゅく": "shinjuku", "カタカナ": "katakana",
        "トーキョー": "tookyoo",
        # mixed script: non-CJK codepoints still fold per-codepoint
        # (é folds via the diacritic table, as in the non-CJK path)
        "北京 café": "bei jing cafe",
    }
    got = t.transliterate(list(cases))
    assert got == list(cases.values()), dict(zip(cases, got))
