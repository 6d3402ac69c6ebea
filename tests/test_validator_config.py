"""Tests for the schema validator and YAML profile config."""

import textwrap

import numpy as np
import pytest


class TestValidator:
    def test_spec_pass_and_fail(self, tmp_path):
        from planetiler_ray.validator import run_spec
        spec = textwrap.dedent("""
        examples:
          - name: equator point
            input: {lon: 0.0, lat: 0.0}
            zoom: 5
            expect:
              tiles: [[16, 16]]
              layers: [0, 1]
          - name: wrong expectation (must fail)
            input: {lon: 0.0, lat: 0.0}
            zoom: 5
            expect:
              tiles: [[0, 0]]
        """)
        p = tmp_path / "spec.yaml"
        p.write_text(spec)
        results = run_spec(str(p))
        assert results[0]["ok"], results[0]
        assert not results[1]["ok"]
        assert "not covered" in results[1]["problems"][0]

    def test_fixture_id_input(self, tmp_path):
        from planetiler_ray import fixtures
        from planetiler_ray.tilemath.tilecoord import tile_of_point
        from planetiler_ray.validator import run_spec
        g = fixtures.georef_from_ids(np.array(["img00000004"]))
        x, y = tile_of_point(g["cx"], g["cy"], 8)
        spec = f"""
        examples:
          - name: fixture chip
            input: {{image_id: img00000004}}
            zoom: 8
            expect:
              tiles: [[{int(x[0])}, {int(y[0])}]]
        """
        p = tmp_path / "s.yaml"
        p.write_text(textwrap.dedent(spec))
        assert run_spec(str(p))[0]["ok"]


class TestYamlProfile:
    def test_compile_and_filter(self, tmp_path, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.config import profile_from_yaml
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.stages.render import RenderConfig
        yml = textwrap.dedent("""
        profile:
          name: rivers-only
          include_when:
            and:
              - {field: caption, match: ["%river%"]}
              - not: {field: caption, match: ["%fast%"]}
          min_zoom: 3
          max_zoom: 3
        """)
        p = tmp_path / "prof.yaml"
        p.write_text(yml)
        prof = profile_from_yaml(str(p))
        assert prof.name == "rivers-only"
        assert prof.render.max_zoom == 3

        n = 120
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        tiles = build_pyramid(ds, fixtures.image_ids(n), prof.render,
                              num_partitions=2, profile=prof).to_pandas()
        caps = fixtures.captions(np.arange(n))
        n_match = sum(("river" in c and "fast" not in c) for c in caps)
        assert n_match > 0
        assert 0 < tiles["n_features"].sum() <= 4 * n_match

    def test_bad_node_raises(self):
        from planetiler_ray.config import compile_expression
        with pytest.raises(ValueError):
            compile_expression({"bogus": 1})
        with pytest.raises(ValueError):
            compile_expression({"field": "x"})
